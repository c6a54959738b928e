"""Grammar-path chunking (operators/chunker_ts.py).

The sandbox has no tree_sitter runtime, so: the DISPATCH is pinned
here unconditionally (no grammar -> line scanner unchanged; a grammar
result, when one exists, wins), and the grammar path itself runs the
existing goldens under a skipif gate for environments where
tree_sitter + grammar wheels are installed."""

import textwrap

import pytest

from codebased_spark.operators.chunker import HAVE_TREE_SITTER, chunk_text
from codebased_spark.operators.chunker_ts import (
    TAG_QUERIES,
    extract_objects_ts,
    have_grammar,
)

PY_SRC = textwrap.dedent(
    '''
    CONSTANT = 1

    class Greeter:
        def hello(self):
            return "hi"

    def main():
        pass
    '''
).strip()


def test_queries_cover_every_scanner_language():
    """Every language the line scanner dispatches on has a tag query
    (and a grammar-module mapping) so installing wheels upgrades ALL
    languages, not a subset."""
    from codebased_spark.operators.chunker import _SCANNERS
    from codebased_spark.operators.chunker_ts import _GRAMMAR_MODULES

    for lang in _SCANNERS:
        assert lang in TAG_QUERIES, lang
        assert lang in _GRAMMAR_MODULES, lang


def test_no_grammar_falls_back_to_scanner():
    """Without tree_sitter, extract_objects_ts returns None and
    chunk_text output is exactly the line scanner's."""
    if HAVE_TREE_SITTER:
        pytest.skip("environment has tree_sitter; fallback not reachable")
    assert extract_objects_ts("python", PY_SRC) is None
    assert not have_grammar("python")
    objs = chunk_text("a.py", "python", PY_SRC)
    assert [(o.name, o.kind) for o in objs] == [
        ("a.py", "file"),
        ("CONSTANT", "definition.constant"),
        ("Greeter", "definition.class"),
        ("hello", "definition.function"),
        ("main", "definition.function"),
    ]


def test_grammar_result_wins_dispatch(monkeypatch):
    """When a grammar extractor yields objects, chunk_text uses them
    (the scanner is the fallback, not a merge)."""
    import codebased_spark.operators.chunker as chunker
    import codebased_spark.operators.chunker_ts as ts

    fake = [chunker.Obj("g", "definition.function", 1, 0, 2, 0, 5, 20, [], [])]
    monkeypatch.setattr(ts, "extract_objects_ts", lambda lang, content: list(fake))
    monkeypatch.setattr(chunker, "HAVE_TREE_SITTER", True)
    objs = chunk_text("a.py", "python", PY_SRC)
    assert [(o.name, o.kind) for o in objs[1:]] == [("g", "definition.function")]


@pytest.mark.skipif(not HAVE_TREE_SITTER, reason="tree_sitter not installed")
def test_grammar_path_python_golden():
    """With real grammars installed, the grammar path reproduces the
    reference's extraction on the python golden (and the full golden
    suite in tests/test_chunker_goldens.py runs through it
    automatically, since chunk_text dispatches grammar-first)."""
    if not have_grammar("python"):
        pytest.skip("tree_sitter present but python grammar wheel missing")
    objs = extract_objects_ts("python", PY_SRC)
    got = sorted((o.name, o.kind) for o in objs)
    assert got == [
        ("CONSTANT", "definition.constant"),
        ("Greeter", "definition.class"),
        ("hello", "definition.function"),
        ("main", "definition.function"),
    ]
