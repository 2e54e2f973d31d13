from .train import CurriculumTrainer, BaseTrainer, ThreeDNoiseTrainer
from .sample import SimultaneousSamplingRunner

from ..config import cfg_get

# Datasets whose items are single range images without inpainting masks:
# trained with the plain LiDARGen loop (reference runners/ncsn_runner.py),
# not the simultaneous curriculum.
PLAIN_DATASETS = frozenset(
    {
        "KITTI",
        "lidar",
        "KITTI360",
        "CIFAR10",
        "KITTIGetMISSING",
        "nuscenes",
        "HDVMinePreGenerated",
        "HDVMineGenerate",
        "HDVMineGenerateFromInvidivualScans",
    }
)


def trainer_for(args, config):
    """Pick the training runner like the reference's dataset dispatch
    (main.py:191-195 routes KITTI360_im_8batch to the simultaneous runner):
    plain single-view datasets train with :class:`BaseTrainer`, the
    simultaneous families with :class:`CurriculumTrainer`.  Overridable via
    ``training.algo: base|curriculum``."""
    algo = cfg_get(config, "training.algo", None)
    if algo is None:
        dataset = cfg_get(config, "data.dataset")
        algo = "base" if dataset in PLAIN_DATASETS else "curriculum"
    if algo == "base":
        return BaseTrainer(args, config)
    if algo == "curriculum":
        return CurriculumTrainer(args, config)
    if algo == "simultaneous_3d":
        return ThreeDNoiseTrainer(args, config)
    raise NotImplementedError(f"training.algo {algo!r} not supported")


__all__ = [
    "CurriculumTrainer",
    "BaseTrainer",
    "ThreeDNoiseTrainer",
    "SimultaneousSamplingRunner",
    "trainer_for",
    "PLAIN_DATASETS",
]
