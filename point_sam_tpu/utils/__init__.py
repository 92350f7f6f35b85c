"""point_sam_tpu.utils"""
