"""Docs-tree integrity: the CPU-side approximation of mkdocs --strict.

The authoritative strict build runs in CI (test.yml `docs` job; mkdocs
is absent in the dev container).  These checks catch the same failure
classes locally: nav entries pointing at missing pages and broken
relative markdown links.
"""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(REPO, "docs")
MKDOCS = os.path.join(REPO, "mkdocs.yml")


@pytest.mark.skipif(not os.path.exists(MKDOCS), reason="no mkdocs.yml")
def test_nav_targets_exist():
    with open(MKDOCS) as f:
        txt = f.read()
    targets = re.findall(r":\s*([\w\-/\.]+\.md)\s*$", txt, re.M)
    assert targets, "nav parse found no targets"
    missing = [t for t in targets
               if not os.path.exists(os.path.join(DOCS, t))]
    assert not missing, f"nav targets missing from docs/: {missing}"


def test_relative_markdown_links_resolve():
    bad = []
    for root, _, files in os.walk(DOCS):
        for fn in files:
            if not fn.endswith(".md"):
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                body = f.read()
            for m in re.finditer(r"\]\(([^)#\s]+?\.md)(#[^)]*)?\)",
                                 body):
                link = m.group(1)
                if link.startswith("http"):
                    continue
                tgt = os.path.normpath(
                    os.path.join(os.path.dirname(path), link))
                if not os.path.exists(tgt):
                    bad.append((os.path.relpath(path, REPO), link))
    assert not bad, f"broken relative links: {bad}"
