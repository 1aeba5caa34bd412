"""docs/QUICKSTART.md cannot rot: every fenced python snippet is executed
verbatim, in order, in one shared namespace (the notebook the doc
simulates).  The snippets carry their own asserts."""

import os
import re

DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "QUICKSTART.md")


def _snippets():
    text = open(DOC).read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def test_quickstart_snippets_execute(spark):
    snippets = _snippets()
    assert len(snippets) >= 8, "doc lost its snippets?"
    # the doc's first snippet creates its own session; reuse the test
    # fixture instead so the suite stays one-session
    ns = {"spark": spark}
    for i, code in enumerate(snippets):
        if "get_spark()" in code:
            continue
        try:
            exec(compile(code, f"{DOC}:snippet{i}", "exec"), ns)
        except Exception as e:
            raise AssertionError(
                f"QUICKSTART snippet {i} failed: {e}\n---\n{code}") from e
