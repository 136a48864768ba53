"""Bitrate metric, robust submission paths, and auto tar_c selection —
VERDICT r1 items #9 and weak #6."""
import numpy as np
import pytest

from wavenet_autoencoders_tpu.eval.infer import _out_path, bitrate
from wavenet_autoencoders_tpu.eval.synthesize import build_tar_utt_map


def test_bitrate_uniform_symbols():
    # 4 equiprobable symbols at 25 Hz for 100 frames over 4 s:
    # H = 2 bits, B = 100 * 2 / 4 = 50 bits/s
    rows = np.repeat(np.eye(4, dtype=np.float64), 25, axis=0)
    br = bitrate([rows], total_seconds=4.0)
    np.testing.assert_allclose(br["entropy_bits"], 2.0, rtol=1e-12)
    np.testing.assert_allclose(br["bitrate"], 50.0, rtol=1e-12)
    assert br["n_distinct"] == 4 and br["n_frames"] == 100


def test_bitrate_single_symbol_is_zero():
    rows = np.zeros((50, 8))
    br = bitrate([rows], total_seconds=2.0)
    assert br["bitrate"] == 0.0 and br["n_distinct"] == 1


def test_bitrate_keys_match_txt_precision():
    # values that only differ beyond the %.6f written precision are the
    # same submission symbol
    a = np.array([[0.12345649]])
    b = np.array([[0.123456451]])
    br = bitrate([a, b], total_seconds=1.0)
    assert br["n_distinct"] == 1


def test_out_path_canonical_and_deep_roots():
    # canonical: .../<lan>/test/<utt>
    assert (
        _out_path("dump/2019/english/test/S090_3000", "dst")
        == "dst/2019/english/test/S090_3000.txt"
    )
    # deeper mount — still finds <lan>/test/<utt> at the tail
    assert (
        _out_path("/mnt/x/y/dump/2019/surprise/test/U1", "o")
        == "o/2019/surprise/test/U1.txt"
    )
    # non-canonical root: explicit lan wins / is required
    assert _out_path("/weird/flat/U2", "o", lan="english") == "o/2019/english/test/U2.txt"
    with pytest.raises(ValueError):
        _out_path("/weird/flat/U2", "o")


def test_build_tar_utt_map_deterministic(tmp_path):
    for name in ["V002_999", "V002_111", "V001_5", "S001_1"]:
        d = tmp_path / name
        d.mkdir()
        np.save(d / "mfcc.norm.npy", np.zeros((3, 39), np.float32))
    (tmp_path / "V003_7").mkdir()  # no feature file -> excluded
    m = build_tar_utt_map(tmp_path, ["V001", "V002", "V003"])
    assert m["V001"].endswith("V001_5/mfcc.norm.npy")
    assert m["V002"].endswith("V002_111/mfcc.norm.npy")  # lexicographic first
    assert "V003" not in m


def test_bitrate_guarded_to_discrete_models():
    """bitrate.json only for VQ/Gumbel latents (VERDICT r2 weak #5)."""
    from wavenet_autoencoders_tpu.config import load_preset
    from wavenet_autoencoders_tpu.eval.infer import _has_discrete_codes
    from wavenet_autoencoders_tpu.models import build_model

    small = (
        "layers=4,stacks=2,residual_channels=8,gate_channels=12,"
        "skip_out_channels=8,encoder_hid=16,cin_channels=8,K=8"
    )
    expected = {"svqwae": True, "vqwae": True, "catae": True,
                "wvae": False, "inae": False}
    for preset, want in expected.items():
        model = build_model(load_preset(preset, small))
        assert _has_discrete_codes(model) is want, preset


def test_validate_submission(tmp_path):
    """Offline stand-in for zerospeech2020-validate (bin/run_valid.sh:8):
    passes on a well-formed tree, raises on the classic failure modes."""
    from scipy.io import wavfile

    from wavenet_autoencoders_tpu.eval.validate import (
        ValidationError,
        validate_submission,
    )

    test_dir = tmp_path / "2019/english/test"
    test_dir.mkdir(parents=True)
    for i in range(3):
        np.savetxt(test_dir / f"S090_{i}.txt", np.random.rand(5, 4), fmt="%.6f")
        wavfile.write(
            test_dir / f"V001_{i}.wav", 16000,
            (np.random.rand(1600) * 1000).astype(np.int16),
        )
    s = validate_submission(tmp_path)
    assert s == {"txt": 3, "wav": 3, "txt_cols": 4}

    # inconsistent column count
    np.savetxt(test_dir / "S090_bad.txt", np.random.rand(5, 7), fmt="%.6f")
    with pytest.raises(ValidationError, match="columns"):
        validate_submission(tmp_path)
    (test_dir / "S090_bad.txt").unlink()

    # non-finite values
    np.savetxt(test_dir / "S090_nan.txt", np.full((3, 4), np.nan))
    with pytest.raises(ValidationError, match="non-finite"):
        validate_submission(tmp_path)
    (test_dir / "S090_nan.txt").unlink()

    # empty wav
    (test_dir / "V001_bad.wav").write_bytes(b"RIFF0000WAVE")
    with pytest.raises(ValidationError, match="wav"):
        validate_submission(tmp_path)
    (test_dir / "V001_bad.wav").unlink()

    # missing language dir
    with pytest.raises(ValidationError, match="missing"):
        validate_submission(tmp_path, lan="surprise")

    # CLI wiring
    from wavenet_autoencoders_tpu.cli.main import main as cli
    cli(["validate", str(tmp_path)])


def test_eval_model_writes_wavs_and_waveplot(tmp_path):
    """eval_model parity with vqwae_train.py:572-640: predicted/target wavs
    AND the waveplots PNG (matplotlib is available in this environment)."""
    import jax
    import numpy as np

    from wavenet_autoencoders_tpu.models import build_model
    from wavenet_autoencoders_tpu.train.eval_hooks import eval_model
    from wavenet_autoencoders_tpu.train.step import init_state
    from test_train import tiny_batch, tiny_cfg

    cfg = tiny_cfg()
    model = build_model(cfg)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    batch = tiny_batch(cfg)
    eval_model(
        cfg, model, state.params, state.model_state, 7, batch, tmp_path
    )
    names = sorted(p.name for p in tmp_path.iterdir())
    assert "step000000007_predicted.wav" in names
    assert "step000000007_target.wav" in names
    assert "step000000007_waveplots.png" in names
