from .modes import Pipeline
from .answer import build_answer
from .batch import generate_batch, load_manifest

__all__ = ["Pipeline", "build_answer", "generate_batch", "load_manifest"]
