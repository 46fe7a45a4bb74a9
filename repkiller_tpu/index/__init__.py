"""repkiller_tpu.index"""
