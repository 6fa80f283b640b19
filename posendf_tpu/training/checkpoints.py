"""Rolling checkpoint store with the reference's latest/previous semantics.

The reference saves every epoch to ``checkpoints/checkpoint_epoch_best.tar``
after copying the prior file to ``..._previous.tar``
(``model/train_posendf.py:147-156``; "best" is really "latest" since
validation is disabled). This store keeps those rolling two-deep semantics —
atomic tmp-file rename, model + optimizer state + epoch — in a framework-
native format (flax.serialization msgpack), and can also ingest the
reference's torch ``.tar`` layout via ``training.torch_import``.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional, Tuple

import flax.serialization as fser

__all__ = ["CheckpointStore"]

LATEST = "checkpoint_latest.msgpack"
PREVIOUS = "checkpoint_previous.msgpack"


class CheckpointStore:
    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    @property
    def latest_path(self) -> str:
        return os.path.join(self.directory, LATEST)

    def save(self, state: Dict[str, Any], epoch: int) -> str:
        """Roll latest -> previous, then atomically write the new latest."""
        payload = {"epoch": epoch, "state": state}
        data = fser.to_bytes(payload)
        tmp = self.latest_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        if os.path.exists(self.latest_path):
            shutil.copyfile(self.latest_path, os.path.join(self.directory, PREVIOUS))
        os.replace(tmp, self.latest_path)
        return self.latest_path

    def restore(self, template: Dict[str, Any]) -> Optional[Tuple[Dict[str, Any], int]]:
        """Restore into the shapes of ``template``; None if no checkpoint.

        Falls back to the previous checkpoint if the latest is unreadable
        (torn write on preemption) — the failure mode the rolling pair is for.
        """
        for name in (LATEST, PREVIOUS):
            path = os.path.join(self.directory, name)
            if not os.path.exists(path):
                continue
            try:
                with open(path, "rb") as f:
                    payload = fser.from_bytes({"epoch": 0, "state": template}, f.read())
                return payload["state"], int(payload["epoch"])
            except Exception:
                continue
        return None
