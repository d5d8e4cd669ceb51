"""C18 config system: JSON roundtrip, presets, derived geometry."""

import dataclasses

import pytest

from samplernn_pase_tpu import config as C


def test_json_roundtrip_all_presets():
    for name in C.PRESETS:
        exp = C.preset(name)
        text = C.to_json(exp)
        back = C.from_json(text)
        assert back == exp, name


def test_roundtrip_nondefault_fields():
    exp = C.ExperimentConfig(
        model=C.SampleRNNConfig(frame_sizes=(8, 2, 2), rnn_type="lstm",
                                weight_norm=True, codec="linear",
                                n_speakers=7, cond_dim=12, cond_rate=32,
                                remat=True),
        pase=C.PASEConfig(sinc_filters=32),
        train=C.TrainConfig(lr_schedule="cosine", warmup_steps=10),
        name="custom")
    assert C.from_json(C.to_json(exp)) == exp


def test_tier_geometry():
    m = C.SampleRNNConfig(frame_sizes=(16, 4, 4))
    assert m.lookback == 256
    assert m.tier_spans == (16, 64, 256)
    assert m.n_tiers == 3


def test_preset_unknown():
    with pytest.raises(KeyError):
        C.preset("nope")


def test_config_files_on_disk_load():
    from pathlib import Path
    for p in sorted(Path("configs").glob("*.json")):
        exp = C.load_config(p)
        assert exp.name == p.stem


def test_replace_keeps_tuple_types():
    m = C.SampleRNNConfig()
    m2 = dataclasses.replace(m, frame_sizes=[8, 8])
    assert m2.frame_sizes == (8, 8)
    assert m2.lookback == 64
