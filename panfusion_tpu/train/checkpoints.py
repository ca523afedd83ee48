"""Checkpoint/resume via orbax (parity surface: SURVEY.md §5.4).

The reference checkpoints under logs/<WANDB_RUN_ID>/checkpoints/ with
save_last + a 10-minute time interval (main.py:34-39), strips eval-metric
keys, and supports warm-starting from a prior run's checkpoint
(PanoGenerator.py:86-114). Here: orbax PyTreeCheckpointer with a `last`
alias, time-interval saving, and a warm-start loader that merges whatever
subtree of params matches (strict-then-lenient, like the reference's
strict=True fallback to strict=False load).
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import traverse_util

def _ocp():
    """Lazy orbax: importing orbax.checkpoint initializes the JAX backend,
    which on a tunnel-less host blocks on the dead axon socket — merely
    importing this module (or runner/models.panfusion, which import it)
    must never touch a device."""
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, interval_minutes: float = 10.0):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        # PANFUSION_CKPT_MINUTES overrides the reference's 10-minute cadence
        # (main.py:35-39): a mid-run orbax save fetches the full train state
        # device->host, which on a tunneled chip can cost minutes — hosts
        # with slow links can trade recovery granularity for throughput.
        interval_minutes = float(
            os.environ.get("PANFUSION_CKPT_MINUTES", interval_minutes)
        )
        self.interval = interval_minutes * 60.0
        # first interval starts now — step 1 must not block on a full
        # multi-GB serialization
        self._last_save = time.time()
        self._ckptr = _ocp().StandardCheckpointer()
        # schedule sidecar written WITH each save, not at fit start: a fresh
        # fit into a directory holding an older `last` (or one that crashes
        # before its first save) must not relabel the old weights with the
        # new config's schedule (ADVICE r4)
        self.schedule_meta: Optional[Dict[str, Any]] = None

    def _path(self, name: str) -> str:
        return os.path.join(self.ckpt_dir, name)

    def save(self, state, name: str = "last", force: bool = True):
        path = self._path(name)
        # orbax refuses to overwrite; write to tmp then swap
        tmp = self._path(f"_tmp_{name}_{int(time.time())}")
        self._ckptr.save(tmp, state)
        self._ckptr.wait_until_finished()
        import shutil

        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        if self.schedule_meta is not None:
            write_schedule_meta(self.ckpt_dir, self.schedule_meta)
        self._last_save = time.time()

    def maybe_save(self, state, name: str = "last") -> bool:
        """Time-interval checkpointing (reference train_time_interval=10min,
        main.py:35-39). `state` may be a zero-arg callable so callers don't
        materialize the save tree on steps that don't save."""
        if time.time() - self._last_save >= self.interval:
            self.save(state() if callable(state) else state, name)
            return True
        return False

    def _restore_numpy(self, path):
        """Restore the whole tree as host numpy arrays, ignoring the saved
        device/sharding metadata. This is deliberate, twice over: (a) a
        checkpoint written on the tunneled TPU must restore in CPU test
        processes (orbax's device-target restore raises 'Device TPU v5
        lite0 was not found'), and (b) restoring device-target arrays over
        the axon tunnel deadlocks on the first host fetch (int(step) hung
        forever — see round-2 notes). Callers feed the numpy leaves back
        into jit, which device-puts them on first use."""
        import numpy as np

        import jax

        ocp = _ocp()
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path)
        structure = getattr(meta, "item_metadata", meta)
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), structure
        )
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args)
        )

    def restore(self, target, name: str = "last"):
        """Restore into the structure of ``target`` (leaves come back as
        host numpy; the saved tree must match target's structure).
        Returns None when ``name`` is absent OR is a directory that isn't
        itself a checkpoint (callers probe several layouts, e.g.
        HorizonNet.load_variables tries <path> then <path>/last)."""
        path = self._path(name)
        if not os.path.exists(path):
            return None
        try:
            restored = self._restore_numpy(path)
        except FileNotFoundError:
            return None
        return _rebuild_like(target, restored)

    def restore_raw(self, name: str = "last"):
        """Restore without a target tree (for loading checkpoints whose
        structure differs from the consumer's — e.g. a fit-saved TrainState
        loaded for eval as a plain param tree)."""
        path = self._path(name)
        if not os.path.exists(path):
            return None
        try:
            return self._restore_numpy(path)
        except FileNotFoundError:
            return None

    def exists(self, name: str = "last") -> bool:
        return os.path.exists(self._path(name))


SCHEDULE_META = "schedule_meta.json"
_SCHEDULE_KEYS = ("prediction_type", "timestep_spacing", "zero_snr")


def schedule_meta_of(cfg, objective: Optional[str] = None) -> Dict[str, Any]:
    """The noise-schedule/objective fields a checkpoint's weights are bound
    to. Checkpoints carry no intrinsic record of the objective they were
    trained with, so resuming an epsilon-trained tree under a v-prediction
    config (or vice versa) silently interprets the net's outputs in the
    wrong parameterization and samples garbage (ADVICE r3). The sidecar
    makes the mismatch loud."""
    meta: Dict[str, Any] = {}
    for k in _SCHEDULE_KEYS:
        if hasattr(cfg, k):
            v = getattr(cfg, k)
            meta[k] = bool(v) if k == "zero_snr" else v
    if objective is not None:
        meta["objective"] = objective
    return meta


def write_schedule_meta(ckpt_dir: str, meta: Dict[str, Any]) -> None:
    import json

    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, SCHEDULE_META), "w") as f:
        json.dump(meta, f, indent=2)


def check_schedule_meta(
    ckpt_dir: str, expected: Dict[str, Any], strict: bool = False,
    context: str = "checkpoint", strict_keys: tuple = (),
) -> Optional[Dict[str, Any]]:
    """Compare a checkpoint dir's recorded schedule against the live config.
    Missing sidecar (pre-metadata checkpoints) passes silently. strict=True
    raises on any mismatch (resume-fit: continuing an eps run as v-pred
    corrupts the run); strict=False warns (warm-start: may be deliberate).
    ``strict_keys`` raise even under strict=False — inference has no
    legitimate use for a prediction_type mismatch (it decodes garbage with
    no other signal, ADVICE r4), so load_or_init_params escalates that one
    key unless --allow_schedule_mismatch is passed."""
    import json

    path = os.path.join(ckpt_dir, SCHEDULE_META)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        saved = json.load(f)
    mismatched = {
        k: (saved[k], v)
        for k, v in expected.items()
        if k in saved and saved[k] != v
    }
    if mismatched:
        desc = ", ".join(
            f"{k}: checkpoint={s!r} vs config={c!r}"
            for k, (s, c) in sorted(mismatched.items())
        )
        msg = (
            f"{context} at {ckpt_dir} was trained with a different "
            f"objective/schedule ({desc}); its weights' outputs would be "
            f"misinterpreted under the current config"
        )
        if strict or any(k in mismatched for k in strict_keys):
            raise ValueError(
                msg + " (pass --allow_schedule_mismatch to override)"
                if not strict else msg
            )
        print(f"WARNING: {msg}")
    return saved


def _rebuild_like(target, restored):
    """Re-attach ``target``'s container types to an orbax numpy restore:
    orbax serializes NamedTuples (TrainState, optax states) as dicts keyed
    by field name, tuples as lists, and empty states as None — rebuild by
    NAME, never by flatten order (NamedTuple field order != dict sorted
    order)."""
    from collections.abc import Mapping

    if restored is None:
        return target  # e.g. optax EmptyState() stored as None
    if hasattr(target, "_fields"):  # NamedTuple
        return type(target)(*(
            _rebuild_like(getattr(target, f), restored[f])
            for f in target._fields
        ))
    if isinstance(target, Mapping):
        # forward compatibility: a checkpoint written before a new variable
        # collection existed (e.g. vae/latent_norm) keeps the target's
        # init values for the missing keys instead of KeyErroring the resume
        for k in target:
            if k not in restored:
                print(f"checkpoint restore: '{k}' absent in saved tree, "
                      f"keeping initialized value")
        return type(target)(
            {k: _rebuild_like(v, restored[k]) if k in restored else v
             for k, v in target.items()}
        )
    if isinstance(target, (list, tuple)):
        return type(target)(
            _rebuild_like(t, r) for t, r in zip(target, restored)
        )
    return restored


def warm_start_params(params: Dict, loaded: Dict) -> Dict:
    """Merge a previously trained param tree into a fresh one, keeping only
    matching paths/shapes (the reference's strict-then-nonstrict
    load_state_dict, PanoGenerator.py:86-94)."""
    flat = dict(traverse_util.flatten_dict(params))
    flat_loaded = traverse_util.flatten_dict(loaded)
    n_hit, n_miss = 0, 0
    for k, v in flat_loaded.items():
        if k in flat and tuple(np.shape(flat[k])) == tuple(np.shape(v)):
            flat[k] = v
            n_hit += 1
        else:
            n_miss += 1
    if n_miss:
        print(f"warm_start_params: merged {n_hit} tensors, skipped {n_miss}")
    return traverse_util.unflatten_dict(flat)
