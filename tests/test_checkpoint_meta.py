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
