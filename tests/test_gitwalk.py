"""Repo ingest (S1/S3/S4/S5): the gitignore matcher is validated against
the REAL git binary (`git ls-files` / `git check-ignore`) — the same
ground truth the reference's vendored parser approximates — plus the
reference's traversal rules (hidden dirs skipped, binary NUL sniff,
symlinks skipped)."""

import os
import subprocess

import pytest

from codebased_spark.sources.gitwalk import (
    IgnoreStack,
    decode_text,
    find_git_root,
    is_binary,
    parse_gitignore_lines,
    read_head_commit,
    repo_corpus,
    walk_repo,
)


def _git(cwd, *args):
    return subprocess.run(["git", "-C", str(cwd), *args],
                          capture_output=True, text=True, check=False)


def _mk(root, rel, content=b"x\n"):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    mode = "wb" if isinstance(content, bytes) else "w"
    with open(p, mode) as f:
        f.write(content)


PATTERN_MATRIX = [
    # (gitignore lines, test paths)
    (["*.log"], ["a.log", "b/a.log", "c.log/x.txt", "notes.txt"]),
    (["build/"], ["build/x.o", "deep/build/y.o", "buildX/z.txt"]),
    (["/top.txt"], ["top.txt", "sub/top.txt"]),
    (["doc/*.md"], ["doc/a.md", "doc/sub/b.md", "other/doc/c.md"]),
    (["**/gen"], ["gen/a.txt", "x/gen/b.txt", "x/y/gen/c.txt", "genx/d.txt"]),
    (["tmp/**"], ["tmp/a", "tmp/b/c", "tmpx/d"]),
    (["a/**/b.txt"], ["a/b.txt", "a/x/b.txt", "a/x/y/b.txt", "b.txt"]),
    (["*.py[cod]"], ["m.pyc", "m.pyd", "m.pyo", "m.py"]),
    (["da?a.csv"], ["data.csv", "dada.csv", "daata.csv"]),
    (["*.log", "!keep.log"], ["x.log", "keep.log", "sub/keep.log"]),
    (["sub/*", "!sub/keep/"], ["sub/x.txt", "sub/keep/y.txt"]),
    (["f*", "!foo", "fo*"], ["foo", "fob", "bar"]),  # last match wins
]


@pytest.mark.parametrize("lines,paths", PATTERN_MATRIX)
def test_matcher_agrees_with_git(tmp_path, lines, paths):
    root = str(tmp_path / "repo")
    os.makedirs(root)
    _git(root, "init", "-q")
    with open(os.path.join(root, ".gitignore"), "w") as f:
        f.write("\n".join(lines) + "\n")
    for p in paths:
        _mk(root, p)

    stack = IgnoreStack()
    with open(os.path.join(root, ".gitignore")) as f:
        stack.push("", parse_gitignore_lines(f))

    for p in paths:
        git_says = _git(root, "check-ignore", "-q", p).returncode == 0
        # our walk prunes ignored dirs, so a file inside an ignored dir
        # is ignored iff any ancestor dir (or itself) is
        parts = p.split("/")
        ours = any(
            stack.ignored("/".join(parts[: i + 1]), is_dir=(i < len(parts) - 1))
            for i in range(len(parts))
        )
        assert ours == git_says, (lines, p, ours, git_says)


def test_nested_gitignore_walk_matches_git(tmp_path):
    """Whole-repo walk == `git ls-files --others` (untracked, ignore
    rules applied) on a repo with nested and negated rules."""
    root = str(tmp_path / "repo")
    os.makedirs(root)
    _git(root, "init", "-q")
    _mk(root, ".gitignore", "*.log\nbuild/\n")
    _mk(root, "src/.gitignore", "generated.py\n!important.log\n")
    _mk(root, "keep.txt")
    _mk(root, "x.log")
    _mk(root, "build/out.o")
    _mk(root, "src/main.py", b"def main():\n    pass\n")
    _mk(root, "src/generated.py")
    _mk(root, "src/important.log")  # negated back in by nested file
    _mk(root, "src/debug.log")      # still ignored by root rule
    _mk(root, "docs/readme.md")

    got = {rel for rel, _lang, _text in walk_repo(root)}
    want = set(
        _git(root, "ls-files", "--others", "--exclude-standard").stdout.splitlines()
    )
    assert got == want
    assert "src/important.log" in got and "src/debug.log" not in got


def test_reference_traversal_rules(tmp_path):
    """Reference-specific gates (codebased/index.py:364-390,427-433):
    hidden directories and symlinks are skipped even when git would
    list them; binary (NUL) files are skipped; non-UTF8 text decodes."""
    root = str(tmp_path / "repo")
    os.makedirs(root)
    _git(root, "init", "-q")
    _mk(root, "ok.py", b"x = 1\n")
    _mk(root, ".hidden_dir/inside.txt")
    _mk(root, ".hidden_file", b"seen\n")  # hidden FILES are kept
    _mk(root, "img.png", b"\x89PNG\x00\x1a")
    _mk(root, "latin.txt", "caf\xe9\n".encode("latin-1"))
    os.symlink(os.path.join(root, "ok.py"), os.path.join(root, "link.py"))

    got = {rel for rel, _l, _t in walk_repo(root)}
    assert got == {"ok.py", ".hidden_file", "latin.txt", ".gitignore"} - {".gitignore"}
    texts = dict((rel, t) for rel, _l, t in walk_repo(root))
    assert texts["latin.txt"] == "caf\xe9\n"
    # strict mode reproduces the reference's skip-on-undecodable
    assert is_binary(b"a\x00b") and not is_binary(b"plain")
    assert decode_text(b"\xff\xfe", strict=True) is None or isinstance(
        decode_text(b"\xff\xfe", strict=True), str)  # chardet may resolve it


def test_git_root_and_commit(tmp_path):
    root = str(tmp_path / "repo")
    os.makedirs(os.path.join(root, "deep", "er"))
    assert find_git_root(os.path.join(root, "deep", "er")) is None
    _git(root, "init", "-q")
    assert find_git_root(os.path.join(root, "deep", "er")) == root
    assert read_head_commit(root) == "0" * 40  # unborn branch
    _mk(root, "a.txt")
    _git(root, "add", "a.txt")
    _git(root, "-c", "user.email=t@t", "-c", "user.name=t", "commit", "-qm", "x")
    sha = _git(root, "rev-parse", "HEAD").stdout.strip()
    assert read_head_commit(root) == sha and len(sha) == 40


def test_repo_corpus_to_index_end_to_end(spark, tmp_path):
    """The first-contact path: git checkout -> corpus -> index -> hit."""
    from codebased_spark.plans.engine import build_index

    root = str(tmp_path / "repo")
    os.makedirs(root)
    _git(root, "init", "-q")
    _mk(root, ".gitignore", "*.secret\n")
    _mk(root, "src/server.py", b'def start_server():\n    return "UNIQUETOKEN"\n')
    _mk(root, "creds.secret", b"do not index\n")

    corpus = repo_corpus(spark, os.path.join(root, "src"))
    rows = {r["path"]: r for r in corpus.collect()}
    assert set(rows) == {".gitignore", "src/server.py"}
    assert rows["src/server.py"]["lang"] == "python"
    assert all(r["repo"] == "repo" for r in rows.values())

    index = build_index(spark, corpus, str(tmp_path / "idx"), num_blocks=2)
    hits = index.search_with_metadata("UNIQUETOKEN", 5).collect()
    assert len(hits) == 1 and hits[0]["path"] == "src/server.py"

    with pytest.raises(ValueError):
        repo_corpus(spark, str(tmp_path))  # not a git repo


def test_matcher_agrees_with_git_randomized(tmp_path):
    """Seeded property test: random pattern files + random path trees,
    every decision compared against `git check-ignore` (the same ground
    truth for every gitignore construct class we emit)."""
    import random

    rng = random.Random(1234)
    frags = ["src", "lib", "a", "bb", "data", "gen", "x1"]
    exts = [".log", ".txt", ".pyc", ".md", ""]

    def rand_pattern():
        kind = rng.randrange(8)
        base = rng.choice(frags)
        ext = rng.choice(exts)
        if kind == 0:
            return f"*{ext or '.tmp'}"
        if kind == 1:
            return f"{base}/"
        if kind == 2:
            return f"/{base}{ext}"
        if kind == 3:
            return f"**/{base}"
        if kind == 4:
            return f"{base}/**"
        if kind == 5:
            return f"{base}/*{ext}"
        if kind == 6:
            return f"?{base[1:] or 'x'}{ext}"
        return f"*.py[co]"

    def rand_path():
        depth = rng.randrange(1, 4)
        parts = [rng.choice(frags) for _ in range(depth - 1)]
        leaf = rng.choice(frags) + rng.choice(exts)
        return "/".join(parts + [leaf])

    for trial in range(6):
        root = str(tmp_path / f"r{trial}")
        os.makedirs(root)
        _git(root, "init", "-q")
        pats = [rand_pattern() for _ in range(rng.randrange(2, 6))]
        # sprinkle a negation referring to an earlier pattern's shape
        if rng.random() < 0.7:
            pats.append("!" + rng.choice(frags) + rng.choice(exts))
        with open(os.path.join(root, ".gitignore"), "w") as f:
            f.write("\n".join(pats) + "\n")

        stack = IgnoreStack()
        with open(os.path.join(root, ".gitignore")) as f:
            stack.push("", parse_gitignore_lines(f))

        paths = sorted({rand_path() for _ in range(25)})
        for p in paths:
            git_says = _git(root, "check-ignore", "-q", p).returncode == 0
            parts = p.split("/")
            ours = any(
                stack.ignored("/".join(parts[: i + 1]), is_dir=(i < len(parts) - 1))
                for i in range(len(parts))
            )
            assert ours == git_says, (trial, pats, p, ours, git_says)
