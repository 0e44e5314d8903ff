from selftoktokenizer_tpu.pipeline.pipeline import SelftokPipeline  # noqa: F401
