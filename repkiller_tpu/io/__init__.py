"""repkiller_tpu.io"""
