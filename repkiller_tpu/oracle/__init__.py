"""repkiller_tpu.oracle"""
