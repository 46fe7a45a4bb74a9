"""repkiller_tpu.extend"""
