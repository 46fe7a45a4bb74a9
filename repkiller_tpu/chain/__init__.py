"""repkiller_tpu.chain"""
