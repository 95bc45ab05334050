from segmentation3d_tpu.io.volume import Volume, read_image, write_image
