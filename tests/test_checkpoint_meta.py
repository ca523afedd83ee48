"""Checkpoint schedule/objective metadata sidecar (ADVICE r3): checkpoints
must record the prediction parameterization they were trained with so that
resuming or sampling an epsilon-trained tree under a v-prediction config
fails loudly instead of decoding garbage (reference analog: the checkpoint
hooks of models/pano/PanoGenerator.py:96-114 carry hparams implicitly via
Lightning's save_hyperparameters)."""
import dataclasses

import pytest

from panfusion_tpu.train.checkpoints import (check_schedule_meta,
                                             schedule_meta_of,
                                             write_schedule_meta)


@dataclasses.dataclass
class _Cfg:
    prediction_type: str = "v_prediction"
    timestep_spacing: str = "trailing"
    zero_snr: bool = True


def test_schedule_meta_roundtrip_and_match(tmp_path):
    meta = schedule_meta_of(_Cfg(), objective="diffusion")
    assert meta == {
        "prediction_type": "v_prediction",
        "timestep_spacing": "trailing",
        "zero_snr": True,
        "objective": "diffusion",
    }
    write_schedule_meta(str(tmp_path), meta)
    # identical config: no raise, returns the saved dict
    saved = check_schedule_meta(str(tmp_path), meta, strict=True)
    assert saved == meta


def test_schedule_meta_mismatch_raises_strict_warns_lenient(tmp_path, capsys):
    write_schedule_meta(str(tmp_path), schedule_meta_of(_Cfg()))
    eps = schedule_meta_of(_Cfg(prediction_type="epsilon", zero_snr=False))
    with pytest.raises(ValueError, match="prediction_type"):
        check_schedule_meta(str(tmp_path), eps, strict=True)
    check_schedule_meta(str(tmp_path), eps, strict=False)
    out = capsys.readouterr().out
    assert "WARNING" in out and "prediction_type" in out


def test_schedule_meta_absent_sidecar_passes(tmp_path):
    # pre-metadata checkpoints: nothing recorded -> nothing to enforce
    assert check_schedule_meta(str(tmp_path), schedule_meta_of(_Cfg()),
                               strict=True) is None


def test_schedule_meta_handles_missing_cfg():
    # models without schedule fields (FAED, HorizonNet) record nothing
    assert schedule_meta_of(None) == {}
    assert schedule_meta_of(object()) == {}


def test_strict_keys_escalate_under_lenient(tmp_path, capsys):
    # inference has no legitimate use for a prediction_type mismatch
    # (ADVICE r4): strict_keys raise even with strict=False, and the error
    # names the escape hatch; other mismatched keys still just warn
    write_schedule_meta(str(tmp_path), schedule_meta_of(_Cfg()))
    eps = schedule_meta_of(_Cfg(prediction_type="epsilon"))
    with pytest.raises(ValueError, match="allow_schedule_mismatch"):
        check_schedule_meta(str(tmp_path), eps, strict=False,
                            strict_keys=("prediction_type",))
    spacing = schedule_meta_of(_Cfg(timestep_spacing="leading"))
    check_schedule_meta(str(tmp_path), spacing, strict=False,
                        strict_keys=("prediction_type",))
    assert "WARNING" in capsys.readouterr().out


def test_sidecar_written_at_save_time_not_fit_start(tmp_path):
    # ADVICE r4: a fresh fit into a directory holding an older `last`
    # trained under a different schedule must NOT relabel the old weights
    # before its own first save
    import numpy as np

    from panfusion_tpu.train.checkpoints import CheckpointManager

    old = schedule_meta_of(_Cfg(prediction_type="epsilon", zero_snr=False))
    write_schedule_meta(str(tmp_path), old)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.schedule_meta = schedule_meta_of(_Cfg())  # the NEW config
    # no save yet: the sidecar still describes the old weights
    assert check_schedule_meta(str(tmp_path), old, strict=True) == old
    ckpt.save({"w": np.zeros(2)}, "last")
    # first successful save: sidecar now matches the saved weights
    assert check_schedule_meta(
        str(tmp_path), ckpt.schedule_meta, strict=True
    ) == ckpt.schedule_meta
