"""point_sam_tpu.datasets"""
