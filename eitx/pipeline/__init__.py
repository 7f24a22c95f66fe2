from .modes import Pipeline
from .answer import build_answer

__all__ = ["Pipeline", "build_answer"]
