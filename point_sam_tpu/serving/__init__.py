"""point_sam_tpu.serving"""
