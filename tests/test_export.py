"""AOT export/reload roundtrip (tools/export_aot.py) on the tiny config."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_export_and_reload(tmp_path):
    import export_aot

    out = str(tmp_path)
    export_aot.do_export(out, frames=8, text_bucket=16, tiny=True)
    assert os.path.exists(os.path.join(out, "generate.jaxexport"))
    assert os.path.exists(os.path.join(out, "vocoder.jaxexport"))
    export_aot.do_check(out, frames=8, text_bucket=16, tiny=True)
