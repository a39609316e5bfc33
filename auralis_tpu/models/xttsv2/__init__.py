from ..registry import register_model


def _build(*args, **kwargs):
    from .engine import XTTSv2Engine

    return XTTSv2Engine(*args, **kwargs)


register_model("xtts", _build)
