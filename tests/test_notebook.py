"""The committed notebook (examples/inference_playground.ipynb) is a thin
wrapper over the same Model/pipeline API the tested script drives
(reference: notebooks/inference_playground.ipynb). This guards that it stays
valid nbformat JSON and only calls API that actually exists, without
executing it (the script equivalent is executed by tests/test_playground.py).
"""

import json
import os
import re


def test_notebook_parses_and_calls_real_api():
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "inference_playground.ipynb")
    with open(path) as f:
        nb = json.load(f)
    assert nb["nbformat"] == 4
    code = "\n".join(
        c["source"] if isinstance(c["source"], str) else "".join(c["source"])
        for c in nb["cells"] if c["cell_type"] == "code"
    )

    from vtoonify_tpu.pipeline.model_api import Model
    from vtoonify_tpu.pipeline.toonify import ToonifyPipeline

    for name in re.findall(r"\bm\.(\w+)\(", code):
        assert hasattr(Model, name), f"Model.{name} referenced but missing"
    for name in re.findall(r"\bpipe\.(\w+)\(", code):
        assert hasattr(ToonifyPipeline, name), (
            f"ToonifyPipeline.{name} referenced but missing")
    # the three parts of the reference notebook are all present
    assert "detect_and_align_image" in code
    assert "compute_style" in code and "process_image" in code
    assert "color_transfer=True" in code
