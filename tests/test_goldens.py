"""Golden-harness round trip in-process: make_goldens -> verify_stage ->
compare_e2e on the tiny synthetic config (the shell harness
tools/run_all_tests.sh runs the same flow as subprocesses)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REFERENCE_META = "/root/reference/reference/det_metadata.json"


def test_goldens_verify_compare_roundtrip(tmp_path, monkeypatch, capsys):
    import compare_e2e
    import make_goldens
    import verify_stage

    out = str(tmp_path / "goldens")
    monkeypatch.setattr(sys, "argv", [
        "make_goldens", "--tiny", "--synthetic", "--seed", "3",
        "--max-frames", "6", "--out", out])
    assert make_goldens.main() == 0
    assert os.path.exists(os.path.join(out, "det_metadata.json"))
    assert os.path.exists(os.path.join(out, "det_hidden_states.bin"))

    monkeypatch.setattr(sys, "argv", [
        "verify_stage", "--tiny", "--synthetic", "--seed", "3", "--goldens", out])
    assert verify_stage.main() == 0

    monkeypatch.setattr(sys, "argv", [
        "compare_e2e", "--tiny", "--synthetic", "--seed", "3", "--goldens", out])
    assert compare_e2e.main() == 0
    report = capsys.readouterr().out
    assert '"pass": true' in report


@pytest.mark.skipif(not os.path.exists(REFERENCE_META),
                    reason="reference checkout not present")
def test_reference_det_metadata_schema():
    """verify_stage.py must be able to consume the REFERENCE's own artifact
    set (scripts/generate_deterministic_reference.py:329-452) — this pins
    every field and artifact name/shape/dtype verify_stage reads, so the
    real-weights run (setup_models -> make_goldens -> verify_stage ->
    compare_e2e, docs/real_weights.md) is turnkey rather than aspirational.
    Only the metadata ships in-tree (the .bin payloads need the real model);
    schema parity is what this guards."""
    with open(REFERENCE_META) as f:
        meta = json.load(f)

    # fields verify_stage.main() reads directly
    assert isinstance(meta["synthesis_text"], str) and meta["synthesis_text"]
    assert isinstance(meta["token_ids"]["language_id"], int)
    assert isinstance(meta["generation"]["max_new_tokens"], int)

    # every artifact verify_stage/compare_e2e loads, with the dtype it
    # np.fromfile()s and the shape contract it assumes
    outputs = meta["outputs"]
    H = 1024  # talker hidden (PipelineConfig default == reference config)
    expect = {
        "det_text_tokens.bin": ("int64", lambda s: s[-1] >= 1),
        "det_speaker_embedding.bin": ("float32", lambda s: s == [H]),
        "det_prefill_embedding.bin": ("float32", lambda s: s[-1] == H),
        "det_speech_codes.bin": ("int64", lambda s: s[-1] == 16),
        "det_decoded_audio.bin": ("float32", lambda s: len(s) == 1),
        "det_hidden_states.bin": ("float32", lambda s: s[-1] == H),
        "det_first_frame_logits.bin": ("float32", lambda s: s[-1] == 3072),
    }
    for name, (dtype, shape_ok) in expect.items():
        assert name in outputs, f"reference metadata missing {name}"
        rec = outputs[name]
        assert rec["dtype"] == dtype, f"{name}: dtype {rec['dtype']} != {dtype}"
        assert shape_ok(list(rec["shape"])), f"{name}: shape {rec['shape']}"
        assert isinstance(rec["sha256"], str) and len(rec["sha256"]) == 64

    # codes/audio/frames must be mutually consistent (63 frames x 1920
    # samples/frame = 120960 @ 24 kHz in the shipped fixture)
    n_frames = outputs["det_speech_codes.bin"]["shape"][0]
    assert outputs["det_hidden_states.bin"]["shape"][0] == n_frames
    assert outputs["det_decoded_audio.bin"]["shape"][0] == n_frames * 1920


@pytest.mark.skipif(not os.path.exists(REFERENCE_META),
                    reason="reference checkout not present")
def test_make_goldens_metadata_matches_reference_schema(tmp_path, monkeypatch):
    """make_goldens.py --synthetic must emit the same metadata skeleton as
    the reference generator, so either producer feeds the same verifier."""
    import make_goldens

    out = str(tmp_path / "goldens")
    monkeypatch.setattr(sys, "argv", [
        "make_goldens", "--tiny", "--synthetic", "--seed", "3",
        "--max-frames", "4", "--out", out])
    assert make_goldens.main() == 0
    with open(os.path.join(out, "det_metadata.json")) as f:
        ours = json.load(f)
    with open(REFERENCE_META) as f:
        ref = json.load(f)

    for key in ("synthesis_text", "token_ids", "generation", "outputs"):
        assert key in ours, f"make_goldens metadata missing {key!r}"
    assert "language_id" in ours["token_ids"]
    assert "max_new_tokens" in ours["generation"]
    # artifact records carry the same per-file schema as the reference's
    ref_rec = ref["outputs"]["det_speech_codes.bin"]
    our_rec = ours["outputs"]["det_speech_codes.bin"]
    for field in ("path", "shape", "dtype", "size_bytes", "sha256"):
        assert field in our_rec, f"artifact record missing {field!r}"
    assert our_rec["dtype"] == ref_rec["dtype"]
    assert our_rec["shape"][-1] == ref_rec["shape"][-1] == 16
