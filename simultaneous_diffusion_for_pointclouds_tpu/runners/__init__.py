from .train import CurriculumTrainer, BaseTrainer
from .sample import SimultaneousSamplingRunner

__all__ = ["CurriculumTrainer", "BaseTrainer", "SimultaneousSamplingRunner"]
