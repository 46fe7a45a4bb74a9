"""repkiller_tpu.seeds"""
