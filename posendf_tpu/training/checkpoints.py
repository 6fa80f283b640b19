"""Rolling checkpoint store with the reference's latest/previous semantics.

The reference saves every epoch to ``checkpoints/checkpoint_epoch_best.tar``
after copying the prior file to ``..._previous.tar``
(``model/train_posendf.py:147-156``; "best" is really "latest" since
validation is disabled). This store keeps those rolling two-deep semantics —
atomic tmp-file rename, model + optimizer state + epoch — with two backends:

  * ``msgpack`` (default): single-file flax.serialization — simple, portable;
  * ``orbax``: Orbax StandardCheckpointer directories — async-capable and the
    ecosystem standard for sharded/multi-host state.

Both restore into the caller's template pytree and fall back to the previous
checkpoint on a torn latest. The reference's torch ``.tar`` layout is
ingested via ``training.torch_import``.
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
    def __init__(self, directory: str, backend: str = "msgpack"):
        self.directory = directory
        if backend not in ("msgpack", "orbax"):
            raise ValueError(f"unknown checkpoint backend {backend!r}")
        self.backend = backend
        os.makedirs(directory, exist_ok=True)
        if backend == "orbax":
            import orbax.checkpoint as ocp

            self._ocp = ocp
            self._ckptr = ocp.StandardCheckpointer()

    @property
    def latest_path(self) -> str:
        return os.path.join(self.directory, LATEST)

    def save(self, state: Dict[str, Any], epoch: int) -> str:
        """Roll latest -> previous, then atomically write the new latest."""
        if self.backend == "orbax":
            return self._save_orbax(state, epoch)
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
        if self.backend == "orbax":
            return self._restore_orbax(template)
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

    # ---- orbax backend -----------------------------------------------------

    def _orbax_dir(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _save_orbax(self, state: Dict[str, Any], epoch: int) -> str:
        latest, previous = self._orbax_dir("latest"), self._orbax_dir("previous")
        tmp = self._orbax_dir("latest.tmp")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._ckptr.save(os.path.abspath(tmp),
                         {"epoch": epoch, "state": state}, force=True)
        self._ckptr.wait_until_finished()
        if os.path.exists(latest):
            if os.path.exists(previous):
                shutil.rmtree(previous)
            os.replace(latest, previous)
        os.replace(tmp, latest)
        return latest

    def _restore_orbax(self, template: Dict[str, Any]):
        import jax

        target = {
            "epoch": 0,
            "state": jax.tree_util.tree_map(lambda x: x, template),
        }
        for name in ("latest", "previous"):
            path = self._orbax_dir(name)
            if not os.path.isdir(path):
                continue
            try:
                payload = self._ckptr.restore(os.path.abspath(path), target)
                return payload["state"], int(payload["epoch"])
            except Exception:
                continue
        return None
