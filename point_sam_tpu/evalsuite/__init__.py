"""point_sam_tpu.evalsuite"""
