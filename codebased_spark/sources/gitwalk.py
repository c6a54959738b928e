"""Repo ingest: git-root discovery + gitignore-aware corpus walk
(operators S1/S3/S4/S5 of SURVEY.md §2.1 — the reference's first-contact
path: find_root_git_repository at codebased/main.py, the per-directory
.gitignore traversal at codebased/index.py:344-390, binary sniff at
index.py:80, decode at codebased/utils.py:5-22).

This is a clean-room implementation of the gitignore matching rules from
the public git documentation (gitignore(5)); nothing is copied from the
reference's vendored parser. Matching semantics:

- per-directory .gitignore files; the one nearest the path that yields a
  decisive answer wins; within a file the LAST matching line wins
  (negations included);
- `*`/`?`/`[...]` never match `/`; `**` spans directories in the three
  spec positions (leading `**/`, trailing `/**`, middle `/**/`);
- a pattern containing a non-trailing slash anchors to its .gitignore's
  directory, otherwise it floats to any depth below it;
- trailing `/` restricts a pattern to directories — and the walk PRUNES
  ignored directories, so their contents are never visited (git's own
  behavior, and what keeps the walk O(live files)).

Traversal mirrors the reference exactly: `.git`/`.codebased` skipped,
symlinks skipped, hidden DIRECTORIES skipped (hidden files kept),
binary = contains NUL, text decoded UTF-8-first (chardet fallback when
available, else latin-1 as a total decoder of last resort — the
reference returns None and skips, but losing files to a missing
optional dependency is worse than a lossy decode; pass
``strict_decode=True`` for reference-identical skipping).

Scale shape: ``repos_corpus`` walks MANY repos, one per task, inside
mapInPandas — the driver never touches the filesystem. A 100 TB ingest
is a DataFrame of (repo, root) rows; each executor streams its repos'
files out as Arrow batches.
"""

from __future__ import annotations

import os
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from codebased_spark.sources.corpus import CORPUS_SCHEMA

# file-type -> engine language tag (chunker dispatch keys)
_EXT_LANG = {
    "py": "python", "js": "javascript", "jsx": "javascript", "ts": "typescript",
    "tsx": "tsx", "go": "go", "rs": "rust", "rb": "ruby", "java": "java",
    "c": "c", "h": "cpp", "cc": "cpp", "cpp": "cpp", "hpp": "cpp",
    "cs": "csharp", "php": "php", "md": "text", "txt": "text",
}


def find_git_root(path: str) -> "str | None":
    """S1: nearest ancestor (including ``path``) containing ``.git``.
    Reference: codebased/main.py's find_root_git_repository."""
    p = os.path.abspath(path)
    while True:
        if os.path.exists(os.path.join(p, ".git")):
            return p
        parent = os.path.dirname(p)
        if parent == p:
            return None
        p = parent


def read_head_commit(root: str) -> str:
    """Current commit sha from .git/HEAD without invoking git; all-zero
    sha when unborn/absent."""
    head = os.path.join(root, ".git", "HEAD")
    try:
        with open(head) as f:
            ref = f.read().strip()
        if ref.startswith("ref: "):
            ref_path = os.path.join(root, ".git", *ref[5:].split("/"))
            if os.path.exists(ref_path):
                with open(ref_path) as f:
                    return f.read().strip()
            packed = os.path.join(root, ".git", "packed-refs")
            if os.path.exists(packed):
                with open(packed) as f:
                    for line in f:
                        if line.strip().endswith(ref[5:]):
                            return line.split()[0]
            return "0" * 40
        return ref  # detached HEAD
    except OSError:
        return "0" * 40


# --- gitignore pattern matching (gitignore(5) spec) --------------------------


def _glob_regex(pattern: str) -> str:
    """One gitignore glob -> regex fragment over a posix relpath."""
    out = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            if pattern[i:i + 2] == "**":
                at_start = i == 0 or pattern[i - 1] == "/"
                if at_start and i + 2 < n and pattern[i + 2] == "/":
                    out.append("(?:[^/]+/)*")  # leading/middle '**/'
                    i += 3
                    continue
                if i + 2 == n:
                    out.append(".*")  # trailing '**'
                    i += 2
                    continue
                out.append("[^/]*")  # bare '**' inside a component
                i += 2
                continue
            out.append("[^/]*")
            i += 1
        elif c == "?":
            out.append("[^/]")
            i += 1
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] in "!^":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                out.append(re.escape(c))
                i += 1
            else:
                cls = pattern[i + 1:j]
                if cls.startswith("!"):
                    cls = "^" + cls[1:]
                out.append("[" + cls + "]")
                i = j + 1
        elif c == "\\" and i + 1 < n:
            out.append(re.escape(pattern[i + 1]))
            i += 2
        else:
            out.append(re.escape(c))
            i += 1
    return "".join(out)


class _Rule:
    __slots__ = ("negation", "dir_only", "rx")

    def __init__(self, negation: bool, dir_only: bool, rx: "re.Pattern"):
        self.negation = negation
        self.dir_only = dir_only
        self.rx = rx

    def match(self, rel: str, is_dir: bool) -> bool:
        if self.dir_only and not is_dir:
            return False
        return self.rx.match(rel) is not None


def parse_gitignore_lines(lines) -> list[_Rule]:
    rules = []
    for raw in lines:
        line = raw.rstrip("\n")
        # trailing spaces are stripped unless backslash-escaped
        while line.endswith(" ") and not line.endswith("\\ "):
            line = line[:-1]
        line = line.replace("\\ ", " ")
        if not line or line.startswith("#"):  # comment ('\#' stays literal)
            continue
        if line == "/":
            continue
        negation = line.startswith("!")
        if negation:
            line = line[1:]
        # literal '\!' / '\#' fall through: _glob_regex's backslash
        # branch escapes the next character
        dir_only = line.endswith("/")
        if dir_only:
            line = line[:-1]
        if not line:
            continue
        anchored = "/" in line
        if line.startswith("/"):
            line = line[1:]
        body = _glob_regex(line)
        prefix = "" if anchored else "(?:[^/]+/)*"
        rules.append(_Rule(negation, dir_only, re.compile(prefix + body + r"\Z")))
    return rules


class IgnoreStack:
    """Nested .gitignore evaluation during a walk: the nearest file with
    a decisive (last-matching-line) answer wins."""

    def __init__(self):
        self._levels: list[tuple[str, list[_Rule]]] = []  # (dir_rel, rules)

    def push(self, dir_rel: str, rules: list[_Rule]) -> None:
        self._levels.append((dir_rel, rules))

    def pop_to(self, dir_rel: str) -> None:
        """Drop levels that are not ancestors of ``dir_rel``."""
        def keeps(base):
            return base == "" or dir_rel == base or dir_rel.startswith(base + "/")
        self._levels = [lv for lv in self._levels if keeps(lv[0])]

    def ignored(self, rel: str, is_dir: bool) -> bool:
        for base, rules in reversed(self._levels):
            sub = rel if base == "" else rel[len(base) + 1:]
            for rule in reversed(rules):  # last matching line wins
                if rule.match(sub, is_dir):
                    return not rule.negation
        return False


# --- traversal + content gates ------------------------------------------------


def is_binary(file_bytes: bytes) -> bool:
    """S4 — the reference's NUL sniff (codebased/index.py:80)."""
    return b"\x00" in file_bytes


def decode_text(file_bytes: bytes, strict: bool = False) -> "str | None":
    """S5 — UTF-8 first, chardet when importable, else latin-1 (total)
    unless ``strict``, which reproduces the reference's skip-on-failure."""
    try:
        return file_bytes.decode("utf-8")
    except UnicodeDecodeError:
        pass
    try:  # pragma: no cover - chardet not in this runtime
        import chardet

        enc = chardet.detect(file_bytes)["encoding"]
        if enc:
            try:
                return file_bytes.decode(enc)
            except (UnicodeDecodeError, LookupError):
                pass
    except ImportError:
        pass
    if strict:
        return None
    return file_bytes.decode("latin-1")


def walk_repo(root: str, strict_decode: bool = False):
    """Yield (relpath, lang, content) for every indexable file under a
    repo root — the reference's event-loop traversal as a generator.
    Ignored directories are pruned (never descended)."""
    root = os.path.abspath(root)
    stack = IgnoreStack()
    dirs = [""]  # relative dir paths, DFS
    while dirs:
        d = dirs.pop()
        stack.pop_to(d)
        full_dir = os.path.join(root, d) if d else root
        try:
            entries = sorted(os.scandir(full_dir), key=lambda e: e.name)
        except (PermissionError, FileNotFoundError):
            continue
        gi = os.path.join(full_dir, ".gitignore")
        if os.path.isfile(gi):
            try:
                with open(gi, encoding="utf-8", errors="replace") as f:
                    stack.push(d, parse_gitignore_lines(f))
            except OSError:
                pass
        for e in entries:
            rel = f"{d}/{e.name}" if d else e.name
            try:
                if e.is_symlink():
                    continue
                if e.is_dir():
                    if e.name in (".git", ".codebased") or e.name.startswith("."):
                        continue
                    if not stack.ignored(rel, is_dir=True):
                        dirs.append(rel)
                    continue
                if not e.is_file() or stack.ignored(rel, is_dir=False):
                    continue
            except OSError:
                continue
            try:
                with open(e.path, "rb") as f:
                    raw = f.read()
            except OSError:
                continue
            if is_binary(raw):
                continue
            text = decode_text(raw, strict=strict_decode)
            if text is None:
                continue
            ext = e.name.rsplit(".", 1)[-1].lower() if "." in e.name else ""
            yield rel, _EXT_LANG.get(ext, "text"), text


def repos_corpus(
    spark: SparkSession, roots: "DataFrame | list[tuple[str, str]]",
    strict_decode: bool = False,
) -> DataFrame:
    """(repo, root) rows -> corpus DataFrame, one repo walked per task
    inside mapInPandas (the driver never reads the filesystem — at fleet
    scale ``roots`` is the work list and executors stream file rows)."""
    if not isinstance(roots, DataFrame):
        roots = spark.createDataFrame(roots, "repo string, root string")

    def batches(it):
        for pdf in it:
            for repo, root in zip(pdf["repo"], pdf["root"]):
                commit = read_head_commit(root)
                rows = [
                    (repo, rel, commit, lang, text)
                    for rel, lang, text in walk_repo(root, strict_decode)
                ]
                yield pd.DataFrame(
                    rows, columns=["repo", "path", "commit", "lang", "content"]
                )

    n = roots.count()
    return roots.repartition(max(n, 1)).mapInPandas(batches, CORPUS_SCHEMA)


def repo_corpus(spark: SparkSession, path: str, repo: "str | None" = None,
                strict_decode: bool = False) -> DataFrame:
    """Convenience single-repo form: S1 root discovery + walk. Raises
    when ``path`` is not inside a git repository, like the reference's
    startup check."""
    root = find_git_root(path)
    if root is None:
        raise ValueError(f"{path} is not inside a git repository")
    name = repo or os.path.basename(root)
    return repos_corpus(spark, [(name, root)], strict_decode)
