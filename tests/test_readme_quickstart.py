"""The README Quickstart must be copy-pasteable and true: extract its
python fence and exec it verbatim (only the sf path is redirected to
the small fixture so the test stays fast)."""

from __future__ import annotations

import re
from pathlib import Path

from tests.conftest import SF_SMALL

README = Path(__file__).resolve().parent.parent / "README.md"


def test_quickstart_snippet_runs(spark, tmp_path):
    text = README.read_text()
    blocks = re.findall(r"```python\n(.*?)```", text, flags=re.S)
    assert blocks, "README has no python Quickstart fence"
    snippet = blocks[0]
    # exactly the documented lines, with the writable paths sandboxed
    # and the sf dir pointed at the small fixture (same schema)
    assert 'sf = "/root/testdata/sf0.01"' in snippet
    assert "/tmp/my_index" in snippet and "/tmp/my_export" in snippet
    snippet = snippet.replace('"/root/testdata/sf0.01"', f'"{SF_SMALL}"')
    snippet = snippet.replace("/tmp/my_index", str(tmp_path / "ix"))
    snippet = snippet.replace("/tmp/my_export", str(tmp_path / "ex"))
    snippet = snippet.replace("/tmp/my_tokenizer", str(tmp_path / "tok"))
    ns: dict = {}
    exec(compile(snippet, str(README), "exec"), ns)  # noqa: S102
    # the snippet's own objects prove each stage really ran
    assert ns["sample"].count() > 0
    # 499: the quickstart's take-down section (3d) deletes doc 7
    assert ns["store"].read(ns["spark"]).count() == 499
    assert ns["ix"].stats()["n_docs"] == 499
    # 4b: the reopened tokenizer served apply from its persisted merges
    assert len(ns["tok"].merges(ns["spark"])) == 8
