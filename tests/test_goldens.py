"""Golden-harness round trip in-process: make_goldens -> verify_stage ->
compare_e2e on the tiny synthetic config (the shell harness
tools/run_all_tests.sh runs the same flow as subprocesses)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


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
