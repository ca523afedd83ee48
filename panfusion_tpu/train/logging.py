"""Experiment logging & observability.

The reference's single observability backend is wandb (SURVEY.md §5.5:
run-id-keyed `logs/<WANDB_RUN_ID>/` dirs, scalar logs, val image panels,
test tables, summary). wandb isn't available offline, so this module
provides a local backend with the same surface: JSONL scalar streams, PNG
image panels, a run summary JSON — all under `logs/<run_id>/` — and a
wandb-compatible `log()` API so the task modules don't care which backend
is active. If the `wandb` package is importable and WANDB_MODE != disabled,
it is used in addition.
"""
from __future__ import annotations

import json
import os
import secrets
import time
from typing import Dict, Optional

import numpy as np


def resolve_run_id() -> str:
    """Run identity from WANDB_RUN_ID (reference main.py:24) or random."""
    rid = os.environ.get("WANDB_RUN_ID")
    if not rid:
        rid = secrets.token_hex(4)
        os.environ["WANDB_RUN_ID"] = rid
    return rid


class ExperimentLogger:
    def __init__(self, log_dir: str = "logs", run_id: Optional[str] = None,
                 project: str = "panfusion"):
        self.run_id = run_id or resolve_run_id()
        self.save_dir = os.path.join(log_dir, self.run_id)
        os.makedirs(self.save_dir, exist_ok=True)
        self._scalar_f = open(
            os.path.join(self.save_dir, "metrics.jsonl"), "a", buffering=1
        )
        self.summary: Dict = {}
        self._wandb = None
        if os.environ.get("WANDB_MODE", "") not in ("disabled",):
            try:
                import wandb  # noqa

                self._wandb = wandb.init(
                    project=project, id=self.run_id, resume="allow",
                    dir=self.save_dir,
                )
            except Exception:
                self._wandb = None

    def truncate_after_step(self, step: int) -> int:
        """Drop metrics.jsonl rows with _step > ``step``.

        Resume hygiene: a fit that resumes from checkpoint step S replays
        steps S+1..; rows beyond S in the stream came from an ABORTED or
        experimental continuation (possibly NaN — observed in round 4) and
        would corrupt the committed curve by interleaving two histories.
        Rows without _step (eval summaries) are kept. Returns #dropped."""
        path = os.path.join(self.save_dir, "metrics.jsonl")
        if not os.path.exists(path):
            return 0
        self._scalar_f.close()
        kept, dropped = [], 0
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    dropped += 1
                    continue
                if row.get("_step") is not None and row["_step"] > step:
                    dropped += 1
                else:
                    kept.append(line)
        if dropped:
            with open(path, "w") as f:
                f.write("\n".join(kept) + ("\n" if kept else ""))
            print(f"metrics.jsonl: dropped {dropped} rows beyond resumed "
                  f"step {step}")
        self._scalar_f = open(path, "a", buffering=1)
        return dropped

    def log(self, metrics: Dict, step: Optional[int] = None):
        row = {"_time": time.time()}
        if step is not None:
            row["_step"] = int(step)
        images = {}
        for k, v in metrics.items():
            if isinstance(v, np.ndarray) and v.ndim >= 2:
                images[k] = v
            else:
                try:
                    row[k] = float(v)
                except (TypeError, ValueError):
                    row[k] = str(v)
        self._scalar_f.write(json.dumps(row) + "\n")
        for k, img in images.items():
            self.log_image(k, img, step)
        if self._wandb is not None:
            # wandb rejects raw ndarrays: wrap image-shaped values
            wb = {
                k: (self._wandb_image(v) if k in images else v)
                for k, v in metrics.items()
            }
            self._wandb.log(wb, step=step)

    def _wandb_image(self, img: np.ndarray):
        import wandb

        if img.dtype != np.uint8:
            img = ((np.clip(img, -1, 1) + 1) * 127.5).astype(np.uint8)
        return wandb.Image(img)

    def log_image(self, name: str, img: np.ndarray, step: Optional[int] = None):
        from PIL import Image

        d = os.path.join(self.save_dir, "media")
        os.makedirs(d, exist_ok=True)
        tag = f"{name.replace('/', '_')}_{step if step is not None else 'x'}"
        if img.dtype != np.uint8:
            img = ((np.clip(img, -1, 1) + 1) * 127.5).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(d, f"{tag}.png"))

    def log_summary(self, metrics: Dict):
        def coerce(v):
            if isinstance(v, str):
                return v  # np.isscalar(str) is True but float(str) raises
            return float(v) if np.isscalar(v) else v

        self.summary.update({k: coerce(v) for k, v in metrics.items()})
        with open(os.path.join(self.save_dir, "summary.json"), "w") as f:
            json.dump(self.summary, f, indent=2, default=str)
        if self._wandb is not None:
            for k, v in metrics.items():
                self._wandb.summary[k] = v

    def finish(self):
        self._scalar_f.close()
        if self._wandb is not None:
            self._wandb.finish()
