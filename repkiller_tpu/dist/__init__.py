"""repkiller_tpu.dist"""
