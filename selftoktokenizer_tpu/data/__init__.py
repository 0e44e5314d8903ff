from selftoktokenizer_tpu.data.native import (  # noqa: F401
    NativeImageLoader, native_available, preprocess_file)
