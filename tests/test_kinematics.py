"""Kinematic tree / level-schedule tests."""

import numpy as np

from posendf_tpu import kinematics


def test_reference_parent_table_exact():
    # must match model/network/net_utils.py:46 exactly — checkpoints bake it in
    assert kinematics.REFERENCE_PARENTS == (
        -1, -1, -1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    )
    assert len(kinematics.REFERENCE_PARENTS) == kinematics.NUM_BODY_JOINTS


def test_level_schedule_covers_all_joints_once():
    for parents in (kinematics.REFERENCE_PARENTS, kinematics.CORRECTED_PARENTS):
        levels = kinematics.level_schedule(parents)
        seen = [j for joint_ids, _ in levels for j in joint_ids]
        assert sorted(seen) == list(range(21))
        assert len(seen) == 21


def test_level_schedule_respects_dependencies():
    for parents in (kinematics.REFERENCE_PARENTS, kinematics.CORRECTED_PARENTS):
        levels = kinematics.level_schedule(parents)
        placed = {}
        for d, (joint_ids, parent_ids) in enumerate(levels):
            for j, p in zip(joint_ids, parent_ids):
                placed[j] = d
                if parents[j] != -1:
                    assert parents[j] in placed and placed[parents[j]] < d
                    assert p == parents[j]
                else:
                    assert p == 0  # dummy gather index for roots


def test_reference_depth_is_12():
    levels = kinematics.level_schedule(kinematics.REFERENCE_PARENTS)
    assert len(levels) == 12
    assert levels[0][0] == (0, 1, 2)  # three roots


def test_full_smpl_tree():
    p = kinematics.SMPL_FULL_PARENTS
    assert len(p) == 24
    assert p[0] == -1
    assert all(p[i] < i for i in range(1, 24))
