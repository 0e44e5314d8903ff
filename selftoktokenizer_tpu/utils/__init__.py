from selftoktokenizer_tpu.utils.logging import (  # noqa: F401
    hf_logger, Registry, Timer, AverageMeter, time_since)
