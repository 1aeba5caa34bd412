"""docs/PIPELINES.md cannot rot: every fenced python snippet is executed
verbatim, in order, in one shared namespace (the notebook the doc
simulates).  The snippets carry their own asserts."""

import os
import re

DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "PIPELINES.md")


def _snippets():
    text = open(DOC).read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def test_pipelines_snippets_execute(spark):
    snippets = _snippets()
    assert len(snippets) >= 7, "doc lost its snippets?"
    ns = {"spark": spark}
    for i, code in enumerate(snippets):
        try:
            exec(compile(code, f"{DOC}:snippet{i}", "exec"), ns)
        except Exception as e:
            raise AssertionError(
                f"PIPELINES snippet {i} failed: {e}\n---\n{code}") from e
