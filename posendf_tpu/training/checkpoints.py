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

import math
import os
import shutil
import warnings
from typing import Any, Dict, Optional, Tuple

import flax.serialization as fser

__all__ = ["CheckpointStore"]


def _check_shapes(restored, template, path: str) -> None:
    """flax.from_bytes does NOT validate shapes — it happily returns the
    stored arrays whatever the template says. A silently mis-shaped restore
    (model config changed under continue_train) would crash later or, worse,
    train the wrong architecture; surface it here as a hard error. (Raising
    beats falling back: 'previous' holds the same shapes, and a silent
    fresh start would overwrite both rolling checkpoints.)"""
    import jax

    def chk(pathspec, a, b):
        a_shape = getattr(a, "shape", None)
        b_shape = getattr(b, "shape", None)
        if a_shape != b_shape:
            raise ValueError(
                f"checkpoint {path} does not match the model: restored leaf "
                f"{jax.tree_util.keystr(pathspec)} has shape {a_shape}, the "
                f"current config expects {b_shape}. Either restore with the "
                "original config or move/delete the checkpoint directory.")

    jax.tree_util.tree_map_with_path(chk, restored, template)

LATEST = "checkpoint_latest.msgpack"
PREVIOUS = "checkpoint_previous.msgpack"
BEST = "checkpoint_best.msgpack"
BEST_META = "checkpoint_best.json"


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
            # rename, not copy: O(1) metadata on the every-epoch hot path,
            # equally crash-safe (restore() falls back to previous if the
            # replace below never lands)
            os.replace(self.latest_path, os.path.join(self.directory, PREVIOUS))
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
            except Exception as e:
                # a torn latest (preemption mid-write) is what the rolling
                # pair is FOR — fall through to previous. But tell the user
                # why: a silently-swallowed template/shape mismatch (e.g.
                # changed model dims under continue_train) would otherwise
                # restart from epoch 0 and overwrite both checkpoints.
                warnings.warn(
                    f"checkpoint {path} failed to restore ({type(e).__name__}: "
                    f"{e}); falling back", stacklevel=2)
                continue
            _check_shapes(payload["state"], template, path)
            return payload["state"], int(payload["epoch"])
        return None

    # ---- validation-gated best checkpoint -----------------------------------
    #
    # The reference saves "checkpoint_epoch_best.tar" every epoch — its "best"
    # is really "latest" because validation is disabled
    # (model/train_posendf.py:147-156). Here "best" is REAL: callers pass the
    # validation metric, the store keeps the best-so-far checkpoint alongside
    # the rolling latest/previous pair, and the sidecar JSON records which
    # epoch/metric it holds. This operationalizes the framework's own measured
    # finding that longer training can silently erode field quality
    # (held-out corr 0.961 @ 4k steps -> 0.359 @ 12k, docs/quality/).

    def _best_target(self) -> str:
        return (self._orbax_dir("best") if self.backend == "orbax"
                else os.path.join(self.directory, BEST))

    def best_info(self) -> Optional[Dict[str, Any]]:
        """{'epoch': int, 'metric': float, 'mode': str} of the stored best
        checkpoint, or None if no best has been saved.

        The sidecar JSON carries a stamp of the weights file it describes;
        a crash between the two ``os.replace`` calls in ``save_best`` can
        leave them desynced, and a meta that does not match the weights on
        disk is treated as absent (the next ``save_best`` then rewrites
        both) rather than mis-attributing a metric to the wrong weights."""
        import json

        path = os.path.join(self.directory, BEST_META)
        if not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                info = json.load(f)
        except (OSError, ValueError):
            return None
        stamp = info.pop("stamp", None)
        if stamp is not None:
            try:
                st = os.stat(self._best_target())
            except OSError:
                return None
            if (int(stamp.get("mtime_ns", -1)) != st.st_mtime_ns
                    or int(stamp.get("size", -1)) != st.st_size):
                return None
        return info

    def save_best(self, state: Dict[str, Any], epoch: int, metric: float,
                  mode: str = "min") -> Optional[str]:
        """Save ``state`` as the best checkpoint iff ``metric`` beats the
        stored one (``mode``: 'min' for losses, 'max' for e.g. correlation).
        Returns the path if saved, None if the stored best is still better."""
        if mode not in ("min", "max"):
            raise ValueError(f"mode must be 'min' or 'max', got {mode!r}")
        # NaN guards: a NaN metric is never "best" (a transiently diverged
        # validation must not poison the retained checkpoint — every later
        # finite metric would compare False against it and never be saved),
        # and a NaN already on disk is treated as absent so the first finite
        # validation replaces it.
        metric = float(metric)
        if math.isnan(metric):
            return None
        info = self.best_info()
        if info is not None:
            prev = float(info["metric"])
            if not math.isnan(prev):
                if (metric >= prev) if mode == "min" else (metric <= prev):
                    return None
        import json

        if self.backend == "orbax":
            best = self._orbax_dir("best")
            tmp = self._orbax_dir("best.tmp")
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            self._ckptr.save(os.path.abspath(tmp),
                             {"epoch": epoch, "state": state}, force=True)
            self._ckptr.wait_until_finished()
            if os.path.exists(best):
                shutil.rmtree(best)
            os.replace(tmp, best)
            path = best
        else:
            payload = {"epoch": epoch, "state": state}
            path = os.path.join(self.directory, BEST)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(fser.to_bytes(payload))
            os.replace(tmp, path)
        meta_tmp = os.path.join(self.directory, BEST_META + ".tmp")
        st = os.stat(self._best_target())
        with open(meta_tmp, "w") as f:
            json.dump({"epoch": int(epoch), "metric": float(metric),
                       "mode": mode,
                       # ties this meta to the exact weights it describes
                       # (best_info invalidates on mismatch)
                       "stamp": {"mtime_ns": st.st_mtime_ns,
                                 "size": st.st_size}}, f)
        os.replace(meta_tmp, os.path.join(self.directory, BEST_META))
        return path

    def restore_best(self, template: Dict[str, Any]) -> Optional[Tuple[Dict[str, Any], int]]:
        """Restore the best checkpoint into ``template`` shapes, or None."""
        if self.backend == "orbax":
            path = self._orbax_dir("best")
            if not os.path.isdir(path):
                return None
            import jax

            target = {"epoch": 0,
                      "state": jax.tree_util.tree_map(lambda x: x, template)}
            payload = self._ckptr.restore(os.path.abspath(path), target)
        else:
            path = os.path.join(self.directory, BEST)
            if not os.path.exists(path):
                return None
            with open(path, "rb") as f:
                payload = fser.from_bytes({"epoch": 0, "state": template},
                                          f.read())
        _check_shapes(payload["state"], template, path)
        return payload["state"], int(payload["epoch"])

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
            except Exception as e:
                warnings.warn(
                    f"orbax checkpoint {path} failed to restore "
                    f"({type(e).__name__}: {e}); falling back", stacklevel=2)
                continue
            _check_shapes(payload["state"], template, path)
            return payload["state"], int(payload["epoch"])
        return None
