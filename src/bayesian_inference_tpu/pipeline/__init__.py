from bayesian_inference_tpu.pipeline.configs import (
    EmulationConfig,
    EmulationGroupConfig,
    MCMCConfig,
    PreprocessingConfig,
)

__all__ = ["EmulationConfig", "EmulationGroupConfig", "MCMCConfig", "PreprocessingConfig"]
