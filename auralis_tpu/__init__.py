"""auralis-tpu: TPU-native XTTSv2 voice-cloning TTS inference framework.

Public API surface mirrors the reference Auralis package
(reference: src/auralis/__init__.py): TTS, TTSRequest, TTSOutput,
AudioPreprocessingConfig, setup_logger, set_vllm_logging_level.
"""

from .common.enhancer import AudioPreprocessingConfig
from .common.logger import set_backend_logging_level, set_vllm_logging_level, setup_logger
from .common.output import TTSOutput
from .common.requests import TTSRequest
from .core.tts import TTS

__version__ = "0.1.0"

__all__ = [
    "TTS",
    "TTSRequest",
    "TTSOutput",
    "AudioPreprocessingConfig",
    "setup_logger",
    "set_vllm_logging_level",
    "set_backend_logging_level",
]
