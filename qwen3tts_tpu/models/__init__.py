from . import talker, code_predictor, transformer_core  # noqa: F401
