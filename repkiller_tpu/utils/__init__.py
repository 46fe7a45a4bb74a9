"""repkiller_tpu.utils"""
