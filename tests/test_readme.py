"""Execute every Python snippet in README.md.

The runnable counterpart of the reference's compile-checked doctest
(lib.rs:13-37): the documented examples must actually work against the
current API.
"""

import os
import re

_README = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md"
)


def test_readme_python_snippets_execute(tmp_path, monkeypatch):
    with open(_README) as f:
        text = f.read()
    blocks = re.findall(r"```python\n(.*?)```", text, re.S)
    assert blocks, "README has no python snippets"

    # Snippets write checkpoint files relative to CWD.
    monkeypatch.chdir(tmp_path)

    ns: dict = {}
    for block in blocks:
        exec(compile(block, "<README.md>", "exec"), ns)

    # The examples produced real fits.
    assert ns["result"].converged
    assert ns["recovered"].shape[0] == 5
    assert ns["result2"].n_iterations >= 1
