"""Dataset registry (reference ``LiDARGen/datasets/__init__.py:19-184``).

String-dispatch over dataset names from the YAML configs.  Concrete dataset
classes live in sibling modules; the registry is filled in lazily so heavy
imports only happen for the dataset actually requested.
"""

from __future__ import annotations

from ..config import cfg_get


def get_dataset(args, config):
    """Return (train_dataset, test_dataset) for ``config.data.dataset``."""
    name = cfg_get(config, "data.dataset")

    if name == "KITTI360_im_8batch":
        from .kitti360 import KITTI360Im8Batch

        return (
            KITTI360Im8Batch(config, split="train"),
            KITTI360Im8Batch(config, split="test"),
        )
    if name == "KITTI360_im_AllForOne":
        from .kitti360 import KITTI360ImAllForOne

        return (
            KITTI360ImAllForOne(config, split="train"),
            KITTI360ImAllForOne(config, split="test"),
        )
    if name == "KITTI360_im_simultaneous_densification":
        from .kitti360 import KITTI360ImSimultaneousDensification

        return (
            KITTI360ImSimultaneousDensification(config, split="train"),
            KITTI360ImSimultaneousDensification(config, split="test"),
        )
    if name == "kitti360_im_SceneCompletion":
        from .scene_completion import KITTI360SceneCompletion

        return (
            KITTI360SceneCompletion(config, split="train"),
            KITTI360SceneCompletion(config, split="test"),
        )
    if name == "KITTI":
        from .lidargen_original import KITTIRaw

        return KITTIRaw(config, split="train"), KITTIRaw(config, split="test")
    if name == "lidar":
        # the reference's single-image overfitting dataset, NOT raw KITTI
        # (datasets/__init__.py:37-46 + datasets/lidar.py)
        from .lidargen_original import LiDARSingle

        exp = getattr(args, "exp", "exp")
        return (
            LiDARSingle(config, split="train", exp=exp),
            LiDARSingle(config, split="test", exp=exp),
        )
    if name == "KITTIGetMISSING":
        from .lidargen_original import KITTIGetMissing

        return (
            KITTIGetMissing(config, split="train"),
            KITTIGetMissing(config, split="test"),
        )
    if name == "nuscenes":
        from .lidargen_original import NuScenesDataset

        return (
            NuScenesDataset(config, split="train"),
            NuScenesDataset(config, split="test"),
        )
    if name == "KITTI360":
        from .kitti360 import KITTI360SingleView

        return (
            KITTI360SingleView(config, split="train"),
            KITTI360SingleView(config, split="test"),
        )
    if name in (
        "HDVMinePreGenerated",
        "HDVMinePreGenerated8Batch",
        "HDVMineGenerate",
        "HDVMineGenerateFromInvidivualScans",
    ):
        from .hdvmine import get_hdvmine_dataset

        return get_hdvmine_dataset(name, config)
    if name == "CIFAR10":
        from .cifar10 import CIFAR10

        return CIFAR10(config, split="train"), CIFAR10(config, split="test")
    if name == "synthetic":
        from .synthetic import SyntheticScenes

        return (
            SyntheticScenes(config, split="train"),
            SyntheticScenes(config, split="test"),
        )
    raise NotImplementedError(f"dataset {name!r} not supported")
