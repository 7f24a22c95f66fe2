from .config import (
    ClassMap,
    EITConfig,
    ImageConfig,
    MeshConfig,
    PipelineConfig,
    SimulationConfig,
)
from .errors import (
    EitxError,
    IngestError,
    MeshingError,
    ModelError,
    SimulationError,
)
from .timing import Timer, timed

__all__ = [
    "ClassMap",
    "EITConfig",
    "ImageConfig",
    "MeshConfig",
    "PipelineConfig",
    "SimulationConfig",
    "EitxError",
    "IngestError",
    "MeshingError",
    "ModelError",
    "SimulationError",
    "Timer",
    "timed",
]
