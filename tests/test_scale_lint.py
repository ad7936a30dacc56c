"""The scale-discipline lint stays clean: every driver-side collect,
cross join, row UDF, or RDD drop-out in non-test source carries an
explicit ``# scale-ok:`` audit marker (tools/scale_lint.py)."""

from __future__ import annotations

import importlib.util
import pathlib


def _lint():
    path = (
        pathlib.Path(__file__).resolve().parent.parent
        / "tools"
        / "scale_lint.py"
    )
    spec = importlib.util.spec_from_file_location("scale_lint", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_unaudited_scale_hazards():
    found = _lint().findings()
    assert not found, "\n".join(found)


def test_marker_contract_detects_violations(tmp_path, monkeypatch):
    """The lint actually fires: an unmarked collect is a finding, a
    marked one is not."""
    mod = _lint()
    src = tmp_path / "pkg"
    src.mkdir()
    (src / "bad.py").write_text("rows = df.collect()\n")
    (src / "good.py").write_text(
        "# scale-ok: bounded test fixture\nrows = df.collect()\n"
    )
    monkeypatch.setattr(mod, "SRC", src)
    found = mod.findings()
    assert len(found) == 1 and "bad.py" in found[0]
