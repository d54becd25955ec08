from thunder_tpu.pipeline.preprocess import preprocess_images, init_sigma  # noqa: F401
