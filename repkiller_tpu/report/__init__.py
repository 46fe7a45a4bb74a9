"""repkiller_tpu.report"""
