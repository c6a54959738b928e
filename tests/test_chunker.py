"""M3: code chunker goldens (mirroring reference tests/test_parser.py
fixtures) + chunked-corpus end-to-end parity with the FTS5 oracle."""

import textwrap

import pytest

from codebased_spark.operators.chunker import chunk_text
from codebased_spark.operators.docs import build_docs
from codebased_spark.operators.score import search_bruteforce
from codebased_spark.oracle import Fts5Oracle
from codebased_spark.sources.corpus import (
    ALL_FIXTURES,
    GITIGNORE_FOLDER,
    NESTED_GITIGNORE,
    SIMPLE_REPO,
    fixture_corpus,
)
from tests.parity import assert_rank_identical, oracle_hits, spark_hits

PY_SOURCE = textwrap.dedent(
    """
    class Point:
        def __init__(self, x, y):
            self.x = x
            self.y = y

    ORIGIN = Point(0, 0)

    def main():
        p = Point(1, 2)
        print("Hello, world!")
    """
)

JS_SOURCE = textwrap.dedent(
    """
    let stringData = "Hello, world!";
    export const numberData = 123;
    const booleanData = true;
    export const nullData = null;
    export let undefinedData = undefined;
    export var objectData = { id: 1, name: 'John', age: 30 };
    var arrayData = [
        { id: 1, name: 'John', age: 30 },
        { id: 2, name: 'Jane', age: 25 },
        { id: 3, name: 'Bob', age: 35 },
    ];

    export const hidePII = (datum) => {
        return {id: datum.id};
    };
    function maskPII(datum) {
        return {
            id: datum.id,
            name: datum.name.replace(/./g, '*'),
            age: string(datum.age).replace(/./g, '*'),
        };
    }

    export const sanitizedData = hidePII(objectData);
    """
)


def test_python_golden():
    """Reference tests/test_parser.py:319-367 object list."""
    objs = chunk_text("src/main.py", "python", PY_SOURCE)
    assert [(o.name, o.kind) for o in objs] == [
        ("src/main.py", "file"),
        ("Point", "definition.class"),
        ("__init__", "definition.function"),
        ("ORIGIN", "definition.constant"),
        ("main", "definition.function"),
    ]
    file, cls, init, origin, main = objs
    assert cls.context_before == [] and cls.context_after == []
    assert init.context_before == [cls.start_row]  # enclosing class line
    assert init.context_after == []
    assert origin.context_before == [] and main.context_before == []
    # spans: class covers its whole indented block
    assert PY_SOURCE.encode()[cls.byte_start : cls.byte_end].startswith(b"class Point:")
    assert PY_SOURCE.encode()[cls.byte_start : cls.byte_end].endswith(b"self.y = y")
    assert PY_SOURCE.encode()[origin.byte_start : origin.byte_end] == b"ORIGIN = Point(0, 0)"


@pytest.mark.parametrize("ext,lang", [("ts", "typescript"), ("js", "javascript"),
                                      ("jsx", "javascript"), ("tsx", "tsx")])
def test_javascript_golden(ext, lang):
    """Reference tests/test_parser.py:12-71 — 11 objects, names+kinds."""
    objs = chunk_text(f"src/constants.{ext}", lang, JS_SOURCE)
    assert len(objs) == 11
    expected = [
        (f"src/constants.{ext}", "file"),
        ("stringData", "definition.constant"),
        ("numberData", "definition.constant"),
        ("booleanData", "definition.constant"),
        ("nullData", "definition.constant"),
        ("undefinedData", "definition.constant"),
        ("objectData", "definition.constant"),
        ("arrayData", "definition.constant"),
        ("hidePII", "definition.function"),
        ("maskPII", "definition.function"),
        ("sanitizedData", "definition.constant"),
    ]
    assert [(o.name, o.kind) for o in objs] == expected
    arr = objs[7]
    assert JS_SOURCE.encode()[arr.byte_start : arr.byte_end].endswith(b"];")


def test_go_rust_ruby_shapes():
    go = chunk_text("m.go", "go", 'package main\n\ntype Point struct {\n\tx int\n}\n\nfunc (p Point) Area() int {\n\treturn 0\n}\n\nfunc main() {\n}\n')
    assert [(o.name, o.kind) for o in go] == [
        ("m.go", "file"),
        ("Point", "definition.type"),
        ("Area", "definition.method"),
        ("main", "definition.function"),
    ]
    rs = chunk_text("l.rs", "rust", "pub struct P {\n    x: i64,\n}\n\nimpl P {\n    pub fn new() -> P {\n        P { x: 0 }\n    }\n}\n")
    assert [(o.name, o.kind) for o in rs] == [
        ("l.rs", "file"),
        ("P", "definition.struct"),
        ("P", "definition.struct.impl"),
        ("new", "definition.function"),
    ]
    assert rs[3].context_before == [rs[2].start_row]  # fn new inside impl
    rb = chunk_text("m.rb", "ruby", "class Foo\n  def bar\n    1\n  end\nend\n")
    assert [(o.name, o.kind) for o in rb] == [
        ("m.rb", "file"),
        ("Foo", "definition.class"),
        ("bar", "definition.method"),
    ]
    assert rb[2].context_before == [rb[1].start_row]
    assert rb[2].context_after == [rb[1].end_row]  # the class's closing 'end'


def test_java_method_context():
    src = (
        "public class Main {\n"
        "    private int x;\n"
        "    public int area() {\n"
        "        return x;\n"
        "    }\n"
        "}\n"
    )
    objs = chunk_text("Main.java", "java", src)
    assert [(o.name, o.kind) for o in objs] == [
        ("Main.java", "file"),
        ("Main", "definition.class"),
        ("area", "definition.method"),
    ]
    assert objs[2].context_before == [0]
    assert objs[2].context_after == [5]  # closing brace line of the class


def test_reference_fixture_object_counts(spark):
    """The reference's own CLI test expectations
    (tests/test_main.py:225-230): objects per repo tree."""
    for rows, n_objects in [
        (SIMPLE_REPO, 2),
        (GITIGNORE_FOLDER, 6),
        (NESTED_GITIGNORE, 10),
    ]:
        docs = build_docs(fixture_corpus(spark, rows), num_blocks=2, chunk=True)
        assert docs.count() == n_objects, rows[0][0]


@pytest.fixture(scope="module")
def chunked(spark):
    docs = build_docs(fixture_corpus(spark, ALL_FIXTURES), num_blocks=4, chunk=True).persist()
    collected = docs.select("doc_id", "path", "name", "content").collect()
    oracle = Fts5Oracle(
        (r["doc_id"], r["path"], r["name"], r["content"]) for r in collected
    )
    yield docs, oracle
    docs.unpersist()


@pytest.mark.parametrize(
    "query", ["Hello world", "Server started", "express", "app require"]
)
@pytest.mark.parametrize("top_k", [10, 32])
def test_chunked_rank_identical(chunked, query, top_k):
    docs, oracle = chunked
    ours = spark_hits(search_bruteforce(docs, query, top_k))
    ref = oracle_hits(oracle.search(query, top_k))
    assert_rank_identical(ours, ref, top_k)


def test_chunked_name_match_branch(chunked):
    """Object names (e.g. 'express') light up the name-match branch."""
    docs, oracle = chunked
    ours = spark_hits(search_bruteforce(docs, "express", 10))
    assert any(nm for _, nm, _ in ours)
    assert_rank_identical(ours, oracle_hits(oracle.search("express", 10)), 10)
