"""SMPL kinematic-tree tables and level scheduling for the structure encoder.

The reference walks 21 per-joint MLPs sequentially in index order, each
consuming its parent's feature (``model/network/net_modules.py:159-169``)
with the parent table from ``model/network/net_utils.py:44-50``:

    [-1, -1, -1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19]

That table looks off-by-one against the true SMPL tree after root removal
(see ``get_parent_mapping_old`` in the reference), but trained checkpoints
bake it in, so it is the default here; the corrected tree is available behind
``corrected=True``.

TPU-first scheduling: instead of 21 sequential tiny MLP calls (kernel-launch
bound on GPU, serialization bound anywhere), we group joints into dependency
*levels* — every joint in a level only reads features of strictly earlier
levels — and run one batched einsum per level over all joints in it. For the
reference table this cuts the sequential depth from 21 to 12.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

__all__ = [
    "NUM_BODY_JOINTS",
    "REFERENCE_PARENTS",
    "CORRECTED_PARENTS",
    "SMPL_FULL_PARENTS",
    "parent_table",
    "level_schedule",
]

NUM_BODY_JOINTS = 21

# Exact table the pretrained reference checkpoints were trained with
# (reference model/network/net_utils.py:46). -1 marks a root joint.
REFERENCE_PARENTS: Tuple[int, ...] = (
    -1, -1, -1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
)

# True SMPL body tree with the pelvis removed and indices shifted down by one
# (joint i here is SMPL joint i+1). Derived from the standard 24-joint SMPL
# parent array [-1,0,0,0,1,2,3,4,5,6,7,8,9,9,9,12,13,14,16,17,18,19,20,21].
CORRECTED_PARENTS: Tuple[int, ...] = (
    -1, -1, -1, 0, 1, 2, 3, 4, 5, 6, 7, 8, 8, 8, 11, 12, 13, 15, 16, 17, 18,
)

# Full 24-joint SMPL kinematic tree (pelvis = 0) used by the JAX LBS layer.
SMPL_FULL_PARENTS: Tuple[int, ...] = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    20, 21,
)


def parent_table(corrected: bool = False) -> Tuple[int, ...]:
    """The 21-joint parent table for the structure encoder."""
    return CORRECTED_PARENTS if corrected else REFERENCE_PARENTS


@lru_cache(maxsize=None)
def level_schedule(parents: Sequence[int]) -> Tuple[Tuple[Tuple[int, ...], Tuple[int, ...]], ...]:
    """Group joints into dependency levels for batched evaluation.

    Returns a tuple of levels; each level is ``(joint_ids, parent_ids)`` with
    ``parent_ids[i] == 0`` substituted for roots (roots read a zero feature
    vector instead, so the gathered value is irrelevant — see encoder).

    Guarantees: every joint appears exactly once; a joint's parent is placed
    in a strictly earlier level; levels preserve ascending joint order (the
    reference walk is a valid topological order because parent < child
    everywhere in the table).
    """
    parents = tuple(parents)
    depth = {}
    for j, p in enumerate(parents):
        if p == -1:
            depth[j] = 0
        else:
            if p >= j:
                raise ValueError(f"parent table is not topologically ordered at joint {j}")
            depth[j] = depth[p] + 1

    num_levels = max(depth.values()) + 1
    levels: List[Tuple[Tuple[int, ...], Tuple[int, ...]]] = []
    for d in range(num_levels):
        joint_ids = tuple(j for j in range(len(parents)) if depth[j] == d)
        parent_ids = tuple(max(parents[j], 0) for j in joint_ids)
        levels.append((joint_ids, parent_ids))
    return tuple(levels)
