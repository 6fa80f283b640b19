"""AMASS dataset split registry.

Same split assignment as the reference (``data/data_splits.py:2-10``) — a
factual list of AMASS subset names shared by the training loader, the data
pipeline and the experiments.
"""

from __future__ import annotations

from typing import Dict, List

__all__ = ["AMASS_SPLITS"]

AMASS_SPLITS: Dict[str, List[str]] = {
    "train": [
        "ACCAD", "BMLhandball", "BMLmovi", "BioMotionLab_NTroje", "CMU",
        "EKUT", "Eyes_Japan_Dataset", "KIT", "MPI_Limits", "TCD_handMocap",
        "TotalCapture",
    ],
    "vald": ["HumanEva", "MPI_HDM05", "SFU", "MPI_mosh"],
    "test": ["Transitions_mocap", "SSM_synced"],
}
