"""repkiller_tpu.families"""
