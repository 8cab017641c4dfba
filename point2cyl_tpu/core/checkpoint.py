"""Checkpointing via orbax.

Reference semantics (``train_Point2Cyl_without_sketch.py:395-430``):
``checkpoint_{epoch:04d}`` every N epochs, a rolling ``model``, and a
``best_model`` gated on epoch > 20 and improved mean epoch loss. Unlike
the reference (which drops optimizer state), the full TrainState —
params, BN stats, optimizer moments, step — is saved, so resume is exact.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, logdir: str):
        self.logdir = os.path.abspath(logdir)
        os.makedirs(self.logdir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.logdir, name)

    def save(self, name: str, state: Any) -> None:
        # Multi-host discipline: EVERY process must call this (orbax
        # synchronizes all processes internally and writes each array
        # once, from the primary — a shared logdir sees a single
        # ocdbt.process_0 writer, verified by
        # tests/test_parallel.py::test_multihost_shared_logdir_resume).
        # Gating on process_index here would deadlock orbax's internal
        # sync_global_processes barriers.
        self._ckptr.save(self._path(name), state, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, name: str, template: Any) -> Any:
        return self._ckptr.restore(self._path(name), template)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def exists_global(self, name: str) -> bool:
        """Process-uniform existence check for resume/rollback gates.

        The local ``os.path`` view can diverge across hosts (ocdbt files
        are written by process 0; logdirs may be per-process), and a
        divergent gate in front of the COLLECTIVE orbax restore
        deadlocks the job — so broadcast process 0's view before anyone
        decides to enter the restore.
        """
        local = self.exists(name)
        if jax.process_count() == 1:
            return local
        import numpy as np
        from jax.experimental import multihost_utils

        vec = np.array([1.0 if local else 0.0], np.float32)
        return bool(multihost_utils.broadcast_one_to_all(vec)[0] > 0)

    def save_epoch(
        self,
        epoch: int,
        state: Any,
        mean_loss: float,
        best_loss: float,
        every: int = 10,
        best_after: int = 20,
    ) -> float:
        """Reference cadence; returns the (possibly updated) best loss."""
        if epoch % every == 0:
            self.save(f"checkpoint_{epoch:04d}", state)
            self.save("model", state)
            if epoch > best_after and mean_loss < best_loss:
                best_loss = mean_loss
                self.save("best_model", state)
            self.save_meta({"epoch": epoch, "best_loss": best_loss})
        return best_loss

    def save_meta(self, meta: dict) -> None:
        """Sidecar resume metadata (epoch counter, best loss); written by
        process 0 only (see :meth:`save`)."""
        if jax.process_index() != 0:
            return
        with open(os.path.join(self.logdir, "meta.json"), "w") as f:
            json.dump(meta, f)

    def load_meta(self) -> dict:
        path = os.path.join(self.logdir, "meta.json")
        meta: dict = {}
        if os.path.exists(path):
            with open(path) as f:
                meta = json.load(f)
        if jax.process_count() > 1:
            # meta.json is written by process 0 only, and logdirs may be
            # per-process rather than shared. Broadcast process 0's view
            # so every resume decision derived from it (the best-loss
            # gate in save_epoch -> the COLLECTIVE orbax save calls) is
            # uniform across processes; divergent best_loss would desync
            # the barrier count inside save() and deadlock the job.
            import numpy as np
            from jax.experimental import multihost_utils

            vec = np.array(
                [
                    1.0 if meta else 0.0,
                    float(meta.get("epoch", 0)),
                    float(meta.get("best_loss", float("inf"))),
                ],
                np.float32,
            )
            vec = np.asarray(multihost_utils.broadcast_one_to_all(vec))
            meta = (
                {"epoch": int(vec[1]), "best_loss": float(vec[2])}
                if vec[0] > 0
                else {}
            )
        return meta


def host_state(state: Any) -> Any:
    """Fetch a device TrainState to host for saving."""
    return jax.device_get(state)


def restore_backbone_vars(mgr: CheckpointManager, name: str, b_vars: dict):
    """Restore backbone {params, batch_stats} from either layout: a full
    trainer-A TrainState or a plain {params, batch_stats} dict (exported by
    the joint trainer as 'pc_model'). Returns updated vars or None."""
    if not mgr.exists(name):
        return None
    plain = {
        "params": b_vars["params"],
        "batch_stats": b_vars["batch_stats"],
    }
    try:
        loaded = mgr.restore(name, plain)
        return {
            "params": loaded["params"],
            "batch_stats": loaded["batch_stats"],
        }
    except Exception:
        pass
    import jax.numpy as jnp

    from point2cyl_tpu.core.config import TrainConfig
    from point2cyl_tpu.train.steps import TrainState, make_optimizer

    # the trainer's optimizer (scheduled adam) so opt_state structures match
    tx = make_optimizer(TrainConfig())
    template = TrainState(
        params=b_vars["params"],
        batch_stats=b_vars["batch_stats"],
        opt_state=tx.init(b_vars["params"]),
        step=jnp.int32(0),
    )
    try:
        st = mgr.restore(name, template)
        return {"params": st.params, "batch_stats": st.batch_stats}
    except Exception:
        return None


def restore_im_vars(mgr: CheckpointManager, name: str, im_params, enc_params,
                    enc_bn):
    """Restore the implicit decoder + encoder from the IGR-pretrain /
    joint-export layout {params: {im, enc}, bn}. Returns
    (im_params, enc_params, enc_bn) or None."""
    if not mgr.exists(name):
        return None
    template = {"params": {"im": im_params, "enc": enc_params}, "bn": enc_bn}
    try:
        loaded = mgr.restore(name, template)
        return (
            loaded["params"]["im"], loaded["params"]["enc"], loaded["bn"]
        )
    except Exception:
        return None
