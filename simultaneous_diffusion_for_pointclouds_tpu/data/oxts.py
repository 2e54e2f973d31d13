"""OXTS GPS/IMU measurements -> metric 4x4 poses.

Re-implementation of ``datasets/convertOxtsToPose.py``: Mercator projection
anchored at the KITTI origin (a lake in Karlsruhe), roll/pitch/heading
rotation composition per the OXTS RT3000 convention.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6378137.0
ORIGIN_OXTS = (48.9843445, 8.4295857)


def lat_to_scale(lat: float) -> float:
    return np.cos(lat * np.pi / 180.0)


def latlon_to_mercator(lat: float, lon: float, scale: float):
    mx = scale * lon * np.pi * EARTH_RADIUS / 180.0
    my = scale * EARTH_RADIUS * np.log(np.tan((90.0 + lat) * np.pi / 360.0))
    return mx, my


def convert_oxts_to_pose(oxts):
    """One (6+,) packet [lat, lon, alt, roll, pitch, heading, ...] or a list
    of packets -> 4x4 pose(s) relative to the Karlsruhe origin."""
    single = not isinstance(oxts, (list, tuple)) and np.ndim(oxts) == 1
    packets = [oxts] if single else list(oxts)

    scale = lat_to_scale(ORIGIN_OXTS[0])
    ox, oy = latlon_to_mercator(*ORIGIN_OXTS, scale)
    origin = np.array([ox, oy, 0.0])

    poses = []
    for pkt in packets:
        pkt = np.asarray(pkt, np.float64)
        if pkt.size == 0:
            poses.append([])
            continue
        tx, ty = latlon_to_mercator(pkt[0], pkt[1], scale)
        t = np.array([tx, ty, pkt[2]]) - origin
        rx, ry, rz = pkt[3], pkt[4], pkt[5]
        cx, sx = np.cos(rx), np.sin(rx)
        cy, sy = np.cos(ry), np.sin(ry)
        cz, sz = np.cos(rz), np.sin(rz)
        r_x = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        r_y = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        r_z = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        rot = r_z @ r_y @ r_x
        pose = np.eye(4)
        pose[:3, :3] = rot
        pose[:3, 3] = t
        poses.append(pose)
    return poses[0] if single else poses
