"""Code-aware chunking (operators P1-P4 of SURVEY.md §2.2).

Splits each source file into FTS documents: always one ``kind='file'``
object spanning the whole file (the reference emits this
unconditionally, codebased/parser.py:124-135) plus one object per code
definition — class/function/method/constant/type — with the reference's
kind taxonomy (``definition.class``, ``definition.function``, ...),
byte ranges, (row, col) coordinates, and enclosing-scope context lines
(codebased/parser.py:79-117 get_context: ancestor start lines above the
node -> context_before, ancestor end lines below -> context_after).

The reference extracts definitions with tree-sitter tag queries
(codebased/parser.py:193-560). tree-sitter is not available in this
runtime, so the default extractor is a deterministic line scanner
(indentation blocks for Python/Ruby, brace matching for the C family)
that reproduces the reference's object lists on its parser test
fixtures for the supported constructs; when the ``tree_sitter`` package
IS importable, ``HAVE_TREE_SITTER`` flips and a grammar-based extractor
can be swapped in per language. Chunking runs inside mapInPandas — one
Python call per file, no per-line UDF round trips.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

try:  # pragma: no cover - not installed in this runtime
    import tree_sitter  # noqa: F401

    HAVE_TREE_SITTER = True
except Exception:  # pragma: no cover
    HAVE_TREE_SITTER = False


class Obj:
    __slots__ = ("name", "kind", "start_row", "start_col", "end_row", "end_col",
                 "byte_start", "byte_end", "context_before", "context_after")

    def __init__(self, name, kind, start_row, start_col, end_row, end_col,
                 byte_start, byte_end, context_before, context_after):
        self.name = name
        self.kind = kind
        self.start_row = start_row
        self.start_col = start_col
        self.end_row = end_row
        self.end_col = end_col
        self.byte_start = byte_start
        self.byte_end = byte_end
        self.context_before = context_before
        self.context_after = context_after


class _Lines:
    """Line index with byte offsets (UTF-8) for span arithmetic."""

    def __init__(self, text: str):
        self.text = text
        self.lines = text.split("\n")
        self.offsets = []
        off = 0
        for ln in self.lines:
            self.offsets.append(off)
            off += len(ln.encode("utf-8")) + 1
        self.total = len(text.encode("utf-8"))

    def byte_at(self, row: int, col_chars: int) -> int:
        return self.offsets[row] + len(self.lines[row][:col_chars].encode("utf-8"))

    def line_end_byte(self, row: int) -> int:
        return self.offsets[row] + len(self.lines[row].encode("utf-8"))


# --- block-end helpers -------------------------------------------------------

def _indent_of(line: str) -> int:
    return len(line) - len(line.lstrip())


def _indent_block_end(L: _Lines, start_row: int) -> int:
    """Last non-blank row of an indentation block (Python/Ruby-style):
    rows below start_row with indent > indent(start_row)."""
    base = _indent_of(L.lines[start_row])
    end = start_row
    for r in range(start_row + 1, len(L.lines)):
        s = L.lines[r]
        if not s.strip():
            continue
        if _indent_of(s) <= base:
            break
        end = r
    return end


def _brace_block_end(L: _Lines, start_row: int) -> int:
    """Row containing the brace that closes the first '{' at/after
    start_row. Quote-aware, comment-naive (fine for fixtures/corpora)."""
    depth = 0
    opened = False
    for r in range(start_row, len(L.lines)):
        in_s: str | None = None
        prev = ""
        for ch in L.lines[r]:
            if in_s:
                if ch == in_s and prev != "\\":
                    in_s = None
            elif ch in "\"'`":
                in_s = ch
            elif ch == "{":
                depth += 1
                opened = True
            elif ch == "}":
                depth -= 1
                if opened and depth == 0:
                    return r
            prev = ch
    return len(L.lines) - 1


def _stmt_end(L: _Lines, start_row: int) -> int:
    """Row where a (possibly multi-line) statement's brackets balance."""
    depth = 0
    for r in range(start_row, len(L.lines)):
        for ch in L.lines[r]:
            if ch in "([{":
                depth += 1
            elif ch in ")]}":
                depth -= 1
        if depth <= 0:
            return r
    return len(L.lines) - 1


def _ruby_block_end(L: _Lines, start_row: int) -> int:
    """Matching 'end' for def/class/module via indent."""
    base = _indent_of(L.lines[start_row])
    for r in range(start_row + 1, len(L.lines)):
        s = L.lines[r]
        if s.strip() == "end" and _indent_of(s) <= base:
            return r
    return len(L.lines) - 1


# --- scope tracking ----------------------------------------------------------

class _Scope:
    __slots__ = ("start_row", "end_row")

    def __init__(self, start_row, end_row):
        self.start_row = start_row
        self.end_row = end_row


def _context(scopes: list[_Scope], start_row: int, end_row: int):
    """get_context semantics: enclosing named scopes contribute their
    start line above the node and end line below it, outermost first,
    strictly shrinking windows (codebased/parser.py:88-117)."""
    before, after = [], []
    lo, hi = float("-inf"), float("inf")
    for sc in scopes:
        if lo < sc.start_row < start_row:
            before.append(sc.start_row)
        if end_row < sc.end_row < hi:
            after.append(sc.end_row)
        lo, hi = sc.start_row, sc.end_row
    return before, after


# --- language scanners -------------------------------------------------------

_PY_CLASS = re.compile(r"^(\s*)class\s+([A-Za-z_]\w*)")
_PY_DEF = re.compile(r"^(\s*)(?:async\s+)?def\s+([A-Za-z_]\w*)")
_PY_ASSIGN = re.compile(r"^([A-Za-z_]\w*)\s*(?::[^=]+)?=\s*")


def _scan_python(L: _Lines):
    out = []
    open_scopes: list[tuple[int, _Scope]] = []  # (indent, scope)
    for r, line in enumerate(L.lines):
        if not line.strip():
            continue
        ind = _indent_of(line)
        while open_scopes and open_scopes[-1][0] >= ind:
            open_scopes.pop()
        scopes = [s for _, s in open_scopes]
        m = _PY_CLASS.match(line) or _PY_DEF.match(line)
        if m:
            kind = (
                "definition.class" if line.lstrip().startswith("class")
                else "definition.function"
            )
            end = _indent_block_end(L, r)
            before, after = _context(scopes, r, end)
            out.append(
                Obj(m.group(2), kind, r, ind, end, len(L.lines[end]),
                    L.byte_at(r, ind), L.line_end_byte(end), before, after)
            )
            open_scopes.append((ind, _Scope(r, end)))
            continue
        if ind == 0:
            m = _PY_ASSIGN.match(line)
            if m:
                end = _stmt_end(L, r)
                out.append(
                    Obj(m.group(1), "definition.constant", r, 0, end,
                        len(L.lines[end]), L.byte_at(r, 0),
                        L.line_end_byte(end), [], [])
                )
    return out


_JS_DECL = re.compile(
    r"^(\s*)(?:export\s+)?(let|const|var)\s+([A-Za-z_$][\w$]*)\s*(?::[^=]+)?=\s*(.*)$"
)
_JS_FUNC = re.compile(r"^(\s*)(?:export\s+)?(?:declare\s+)?(?:async\s+)?function\s*\*?\s*([A-Za-z_$][\w$]*)")
_JS_CLASS = re.compile(r"^(\s*)(?:export\s+)?(?:declare\s+)?(?:abstract\s+)?class\s+([A-Za-z_$][\w$]*)")
_TS_IFACE = re.compile(r"^(\s*)(?:export\s+)?(?:declare\s+)?interface\s+([A-Za-z_$][\w$]*)")
_TS_MODULE = re.compile(
    r"^(\s*)(?:export\s+)?(?:declare\s+)?(?:namespace|module)\s+([A-Za-z_$][\w$.]*)"
)
_ARROWISH = re.compile(r"^(?:async\s+)?(?:\([^)]*\)|[A-Za-z_$][\w$]*)\s*(?::[^=>]+)?=>")
_JS_METHOD = re.compile(
    r"^(\s*)((?:(?:static|async|get|set|public|private|protected|readonly|"
    r"override|abstract)\s+)*)\*?\s*([A-Za-z_$][\w$]*)\s*(?:<[^>]*>)?\("
)
_JS_ASSIGN = re.compile(
    r"^(\s*)([A-Za-z_$][\w$]*(?:\.[A-Za-z_$][\w$]*)*)\s*=\s*([^=].*)$"
)
_JS_PAIR = re.compile(r"^(\s*)([A-Za-z_$][\w$]*)\s*:\s*(.*)$")
_JS_STMT_KEYWORDS = {
    "if", "for", "while", "switch", "catch", "return", "else", "do", "new",
    "typeof", "await", "yield", "function", "class", "interface", "super",
    "throw", "delete", "void", "in", "of", "case", "break", "continue",
}


def _is_fn_value(value: str) -> bool:
    """tree-sitter's [(arrow_function) (function_expression)] test for a
    declarator/assignment/pair initializer (parser.py:343-355)."""
    return bool(_ARROWISH.match(value)) or value.startswith(("function", "async function"))


def _value_end(L: _Lines, row: int) -> tuple[int, int]:
    """(end_row, end_col_chars) of an initializer value, excluding any
    trailing ';' — tree-sitter's declarator/assignment nodes stop at the
    value (the reference byte ranges have no semicolon)."""
    end = _brace_block_end(L, row) if "{" in L.lines[row] else _stmt_end(L, row)
    tail = L.lines[end].rstrip()
    if tail.endswith(";"):
        tail = tail[:-1].rstrip()
    return end, len(tail)


def _scan_javascript(L: _Lines):
    """JS/TS scanner — coverage mirrors the reference's tag queries
    (codebased/parser.py:267-359): program-level constants, function/
    generator declarations, classes (incl. abstract) and interfaces,
    TS namespaces/modules, method definitions and TS method signatures,
    and arrow/function values bound via declarators, assignments, or
    object-literal pairs at any nesting depth."""
    out = []
    # (indent, kind, scope): kind in {class, iface, module, fn}
    stack: list[tuple[int, str, _Scope]] = []

    def scopes_for(r):
        return [s for _, _, s in stack if s.start_row < r]

    def push(ind, kind, r, end):
        stack.append((ind, kind, _Scope(r, end)))

    for r, line in enumerate(L.lines):
        while stack and stack[-1][2].end_row < r:
            stack.pop()
        if not line.strip():
            continue
        ind = _indent_of(line)
        top_kind = stack[-1][1] if stack else None
        scopes = scopes_for(r)

        m = _JS_CLASS.match(line) or _TS_IFACE.match(line)
        if m:
            kind = (
                "definition.interface" if "interface" in line.split(m.group(2))[0]
                else "definition.class"
            )
            end = _brace_block_end(L, r)
            start_col = line.find("class" if kind == "definition.class" else "interface")
            before, after = _context(scopes, r, end)
            out.append(Obj(m.group(2), kind, r, start_col, end,
                           len(L.lines[end]), L.byte_at(r, start_col),
                           L.line_end_byte(end), before, after))
            push(ind, "iface" if kind == "definition.interface" else "class", r, end)
            continue
        m = _TS_MODULE.match(line)
        if m and "{" in line:
            end = _brace_block_end(L, r)
            kw = "namespace" if "namespace" in line else "module"
            start_col = line.find(kw)
            before, after = _context(scopes, r, end)
            out.append(Obj(m.group(2), "definition.module", r, start_col, end,
                           len(L.lines[end]), L.byte_at(r, start_col),
                           L.line_end_byte(end), before, after))
            push(ind, "module", r, end)
            continue
        m = _JS_FUNC.match(line)
        if m:
            # function_declaration / generator_function_declaration at
            # any depth; a body-less TS function_signature ends at ';'
            has_body = "{" in line
            end = _brace_block_end(L, r) if has_body else _stmt_end(L, r)
            start_col = line.find("function")
            head = line[:start_col]
            for kw in ("async", "declare"):
                if re.search(rf"\b{kw}\s*$", head):
                    start_col = line.find(kw)
                    head = line[:start_col]
            before, after = _context(scopes, r, end)
            out.append(Obj(m.group(2), "definition.function", r, start_col, end,
                           len(L.lines[end]), L.byte_at(r, start_col),
                           L.line_end_byte(end), before, after))
            if has_body:
                push(ind, "fn", r, end)
            continue
        m = _JS_DECL.match(line)
        if m:
            name, value = m.group(3), m.group(4)
            is_fn = _is_fn_value(value)
            if is_fn:
                # variable_declarator node: name .. end of value, no ';'
                end, end_col = _value_end(L, r)
                start_col = line.find(name, line.find(m.group(2)))
                before, after = _context(scopes, r, end)
                out.append(Obj(name, "definition.function", r, start_col, end,
                               end_col, L.byte_at(r, start_col),
                               L.byte_at(end, end_col), before, after))
                if "{" in value:
                    push(ind, "fn", r, end)
            elif ind == 0:
                # program-level (lexical|variable)_declaration: constant
                end = _stmt_end(L, r)
                start_col = line.find(m.group(2))
                out.append(Obj(name, "definition.constant", r, start_col, end,
                               len(L.lines[end]), L.byte_at(r, start_col),
                               L.line_end_byte(end), [], []))
            continue
        if top_kind in ("class", "iface") and stack[-1][0] < ind:
            m = _JS_METHOD.match(line)
            if m and m.group(3) not in _JS_STMT_KEYWORDS:
                has_body = "{" in line
                if top_kind == "class" and not has_body and not m.group(2).strip():
                    pass  # field/call-looking line, not a concrete method
                else:
                    end = _brace_block_end(L, r) if has_body else _stmt_end(L, r)
                    start_col = ind
                    before, after = _context(scopes, r, end)
                    out.append(Obj(m.group(3), "definition.method", r, start_col,
                                   end, len(L.lines[end]), L.byte_at(r, start_col),
                                   L.line_end_byte(end), before, after))
                    if has_body:
                        push(ind, "fn", r, end)
                    continue
        if top_kind not in ("class", "iface"):
            m = _JS_ASSIGN.match(line)
            if (m and _is_fn_value(m.group(3))
                    and m.group(2).split(".")[0] not in _JS_STMT_KEYWORDS):
                # assignment_expression with arrow/function RHS
                name = m.group(2).split(".")[-1]
                end, end_col = _value_end(L, r)
                start_col = line.find(m.group(2))
                before, after = _context(scopes, r, end)
                out.append(Obj(name, "definition.function", r, start_col, end,
                               end_col, L.byte_at(r, start_col),
                               L.byte_at(end, end_col), before, after))
                if "{" in m.group(3):
                    push(ind, "fn", r, end)
                continue
            m = _JS_PAIR.match(line)
            if (m and _is_fn_value(m.group(3))
                    and m.group(2) not in _JS_STMT_KEYWORDS):
                # (pair key: value: arrow/function) in an object literal
                end, end_col = _value_end(L, r)
                tail = L.lines[end].rstrip()
                if tail.endswith(","):
                    end_col = len(tail) - 1
                start_col = line.find(m.group(2))
                before, after = _context(scopes, r, end)
                out.append(Obj(m.group(2), "definition.function", r, start_col,
                               end, end_col, L.byte_at(r, start_col),
                               L.byte_at(end, end_col), before, after))
                if "{" in m.group(3):
                    push(ind, "fn", r, end)
    return out


_GO_FUNC = re.compile(r"^func\s+(?:\(([^)]*)\)\s+)?([A-Za-z_]\w*)\s*\(")
_GO_TYPE = re.compile(r"^type\s+([A-Za-z_]\w*)\s+")


def _scan_go(L: _Lines):
    out = []
    for r, line in enumerate(L.lines):
        m = _GO_FUNC.match(line)
        if m:
            kind = "definition.method" if m.group(1) else "definition.function"
            end = _brace_block_end(L, r)
            out.append(Obj(m.group(2), kind, r, 0, end, len(L.lines[end]),
                           L.byte_at(r, 0), L.line_end_byte(end), [], []))
            continue
        m = _GO_TYPE.match(line)
        if m:
            end = _brace_block_end(L, r) if "{" in line else _stmt_end(L, r)
            out.append(Obj(m.group(1), "definition.type", r, 0, end,
                           len(L.lines[end]), L.byte_at(r, 0),
                           L.line_end_byte(end), [], []))
    return out


_JAVA_CLASS = re.compile(
    r"^(\s*)(?:(?:public|private|protected|static|final|abstract)\s+)*"
    r"(class|interface|enum)\s+([A-Za-z_]\w*)"
)
_JAVA_METHOD = re.compile(
    r"^(\s*)(?:(?:public|private|protected|static|final|abstract|synchronized)\s+)+"
    r"[\w<>\[\], ]+\s+([A-Za-z_]\w*)\s*\([^;]*$"
)
_JAVA_NAMESPACE = re.compile(r"^(\s*)(namespace)\s+([A-Za-z_][\w.]*)")


def _scan_java(L: _Lines):
    out = []
    scopes: list[tuple[int, _Scope]] = []
    for r, line in enumerate(L.lines):
        ind = _indent_of(line)
        while scopes and r > scopes[-1][1].end_row:
            scopes.pop()
        m = _JAVA_CLASS.match(line)
        if m:
            kind = {"class": "definition.class", "interface": "definition.interface",
                    "enum": "definition.class"}[m.group(2)]
            end = _brace_block_end(L, r)
            before, after = _context([s for _, s in scopes], r, end)
            col = line.find(m.group(2))
            out.append(Obj(m.group(3), kind, r, col, end, len(L.lines[end]),
                           L.byte_at(r, col), L.line_end_byte(end), before, after))
            scopes.append((ind, _Scope(r, end)))
            continue
        m = _JAVA_NAMESPACE.match(line)
        if m:
            end = _brace_block_end(L, r)
            before, after = _context([s for _, s in scopes], r, end)
            col = line.find("namespace")
            out.append(Obj(m.group(3), "definition.module", r, col, end,
                           len(L.lines[end]), L.byte_at(r, col),
                           L.line_end_byte(end), before, after))
            scopes.append((ind, _Scope(r, end)))
            continue
        m = _JAVA_METHOD.match(line)
        if m and scopes and "=" not in line.split("(")[0]:
            # methods exist only inside class/interface/namespace bodies;
            # a top-level "method" is a grammar error tree-sitter never
            # tags (the C# golden's Main)
            end = _brace_block_end(L, r)
            before, after = _context([s for _, s in scopes], r, end)
            out.append(Obj(m.group(2), "definition.method", r, ind, end,
                           len(L.lines[end]), L.byte_at(r, ind),
                           L.line_end_byte(end), before, after))
    return out


_RUST_STRUCT = re.compile(r"^(\s*)(?:pub(?:\([^)]*\))?\s+)?struct\s+([A-Za-z_]\w*)")
_RUST_TRAIT = re.compile(r"^(\s*)(?:pub(?:\([^)]*\))?\s+)?trait\s+([A-Za-z_]\w*)")
_RUST_IMPL = re.compile(r"^(\s*)impl(?:<[^>]*>)?\s+([A-Za-z_][\w:<>]*)")
_RUST_FN = re.compile(r"^(\s*)(?:pub(?:\([^)]*\))?\s+)?(?:const\s+)?(?:async\s+)?(?:unsafe\s+)?fn\s+([A-Za-z_]\w*)")
_RUST_ENUM = re.compile(r"^(\s*)(?:pub(?:\([^)]*\))?\s+)?enum\s+([A-Za-z_]\w*)")
_RUST_UNION = re.compile(r"^(\s*)(?:pub(?:\([^)]*\))?\s+)?union\s+([A-Za-z_]\w*)")
_RUST_TYPE = re.compile(r"^(\s*)(?:pub(?:\([^)]*\))?\s+)?type\s+([A-Za-z_]\w*)")
_RUST_MOD = re.compile(r"^(\s*)(?:pub(?:\([^)]*\))?\s+)?mod\s+([A-Za-z_]\w*)")
_RUST_MACRO = re.compile(r"^(\s*)macro_rules!\s+([A-Za-z_]\w*)")


def _scan_rust(L: _Lines):
    """Coverage mirrors the reference rust tag query
    (codebased/parser.py:410-460): struct/enum/union/type alias,
    fn, trait, mod, macro_rules!, and the two impl flavors
    (``impl Trait for X`` tags the TRAIT as definition.trait.impl;
    a bare ``impl X`` tags the type as definition.struct.impl)."""
    out = []
    scopes: list[tuple[int, _Scope]] = []
    for r, line in enumerate(L.lines):
        ind = _indent_of(line)
        while scopes and r > scopes[-1][1].end_row:
            scopes.pop()
        for rx, kind in ((_RUST_STRUCT, "definition.struct"),
                         (_RUST_ENUM, "definition.class"),
                         (_RUST_UNION, "definition.class"),
                         (_RUST_TYPE, "definition.class"),
                         (_RUST_TRAIT, "definition.interface"),
                         (_RUST_MOD, "definition.module"),
                         (_RUST_MACRO, "definition.macro"),
                         (_RUST_IMPL, "definition.struct.impl"),
                         (_RUST_FN, "definition.function")):
            m = rx.match(line)
            if m is None:
                continue
            name = m.group(2)
            if rx is _RUST_FN:
                # a bodyless `fn ...;` (trait/extern signature) is a
                # function_signature_item — the reference query tags
                # only (function_item), i.e. fns WITH a body
                j = r
                sig_only = False
                while j < len(L.lines):
                    seg = L.lines[j]
                    bi, si = seg.find("{"), seg.find(";")
                    if j == r:
                        after_m = seg[m.end(2):]
                        bi, si = after_m.find("{"), after_m.find(";")
                    if bi != -1 and (si == -1 or bi < si):
                        break
                    if si != -1:
                        sig_only = True
                        break
                    j += 1
                if sig_only:
                    break
            if kind == "definition.struct.impl" and " for " in line:
                kind = "definition.trait.impl"  # the trait is the name
            stmt_like = (
                kind == "definition.class" and rx is _RUST_TYPE
            ) or (kind == "definition.module" and "{" not in line)
            if stmt_like:
                end = _stmt_end(L, r)
            elif "{" in line or kind not in ("definition.struct",):
                end = _brace_block_end(L, r)
            else:
                end = _stmt_end(L, r)  # tuple/unit structs end with ';'
            before, after = _context([s for _, s in scopes], r, end)
            out.append(Obj(name, kind, r, ind, end, len(L.lines[end]),
                           L.byte_at(r, ind), L.line_end_byte(end),
                           before, after))
            if kind in ("definition.struct.impl", "definition.trait.impl",
                        "definition.interface", "definition.module") and "{" in line:
                scopes.append((ind, _Scope(r, end)))
            break
    return out


_RB_DEF = re.compile(r"^(\s*)def\s+(?:self\.)?([A-Za-z_]\w*[?!=]?)")
_RB_CLASS = re.compile(r"^(\s*)(class|module)\s+([A-Z]\w*(?:::[A-Z]\w*)*)")
_RB_ALIAS = re.compile(r"^(\s*)alias\s+:?([A-Za-z_]\w*[?!=]?)")


def _scan_ruby(L: _Lines):
    out = []
    scopes: list[tuple[int, _Scope]] = []
    for r, line in enumerate(L.lines):
        ind = _indent_of(line)
        while scopes and r > scopes[-1][1].end_row:
            scopes.pop()
        m = _RB_CLASS.match(line)
        if m:
            end = _ruby_block_end(L, r)
            kind = "definition.class" if m.group(2) == "class" else "definition.module"
            before, after = _context([s for _, s in scopes], r, end)
            name = m.group(3).rsplit("::", 1)[-1]  # (scope_resolution name: _)
            out.append(Obj(name, kind, r, ind, end, len(L.lines[end]),
                           L.byte_at(r, ind), L.line_end_byte(end), before, after))
            scopes.append((ind, _Scope(r, end)))
            continue
        m = _RB_DEF.match(line)
        if m:
            end = _ruby_block_end(L, r)
            before, after = _context([s for _, s in scopes], r, end)
            out.append(Obj(m.group(2), "definition.method", r, ind, end,
                           len(L.lines[end]), L.byte_at(r, ind),
                           L.line_end_byte(end), before, after))
            continue
        m = _RB_ALIAS.match(line)
        if m:
            # (alias name: (_) @name) @definition.method — the new name,
            # node = the one-line alias statement
            before, after = _context([s for _, s in scopes], r, r)
            out.append(Obj(m.group(2), "definition.method", r, ind, r,
                           len(line), L.byte_at(r, ind),
                           L.line_end_byte(r), before, after))
    return out


_PP_NAMED = re.compile(r"^\s*#\s*(?:ifndef|ifdef)\s+([A-Za-z_]\w*)")
_PP_OPEN = re.compile(r"^\s*#\s*(?:if|ifdef|ifndef)\b")
_PP_END = re.compile(r"^\s*#\s*endif\b")
_C_TYPEDEF = re.compile(r"^typedef\b")
_C_STRUCT = re.compile(r"^(\s*)(struct|class)\s+([A-Za-z_]\w*)")
_C_ENUM = re.compile(r"^(\s*)enum\s+(?:class\s+)?([A-Za-z_]\w*)")
_C_UNION = re.compile(r"^(\s*)union\s+([A-Za-z_]\w*)")
_C_FUNC = re.compile(
    r"^(\s*)(?:[A-Za-z_][\w:<>~\*\&\s]*?[\s\*\&])?((?:[A-Za-z_]\w*::)?[A-Za-z_~]\w*)\s*\([^;]*\)\s*(?:const\s*)?\{?\s*$"
)
_CPP_METHOD_DECL = re.compile(
    r"^\s*(?:(?:virtual|static|inline|explicit|constexpr|friend)\s+)*"
    r"[A-Za-z_][\w:<>]*(?:\s*[\*\&]+\s*|\s+)([A-Za-z_]\w*)\s*\([^;{]*\)\s*"
    r"(?:const\s*)?(?:override\s*)?(?:final\s*)?(?:=\s*0\s*)?;"
)
_C_KEYWORDS = {"if", "while", "for", "switch", "return", "else", "do", "sizeof",
               "typedef", "struct", "class", "enum", "union"}


def _preproc_scopes(L: _Lines) -> list[_Scope]:
    """Named #ifdef/#ifndef ... #endif intervals — tree-sitter's
    preproc_ifdef nodes have a name field, so they participate in
    get_context as enclosing scopes (the C++ golden's #ifndef lines)."""
    out, stack = [], []
    for r, line in enumerate(L.lines):
        if _PP_OPEN.match(line):
            stack.append((r, bool(_PP_NAMED.match(line))))
        elif _PP_END.match(line) and stack:
            start, named = stack.pop()
            if named:
                out.append(_Scope(start, r))
    return out


def _c_body_kind(L: _Lines, r: int):
    """Does the declaration starting at row r open a braced body before
    the statement ends? -> ('{' row) or None."""
    for i in range(r, min(r + 20, len(L.lines))):
        line = L.lines[i]
        brace = line.find("{")
        semi = line.find(";")
        if brace != -1 and (semi == -1 or brace < semi):
            return i
        if semi != -1:
            return None
    return None


def _scan_c(L: _Lines):
    """C/C++ combined per the reference (cpp uses C_TAG_QUERY +
    CPP_TAG_QUERY, codebased/parser.py:475-478): typedefs -> type,
    struct/class with body -> struct/class, method declarations inside
    class bodies -> method (constructors/destructors excluded — their
    declarator is not a field_identifier), function definitions ->
    function (namespace-qualified -> method)."""
    out = []
    pp = _preproc_scopes(L)
    scopes: list[tuple[int, _Scope, bool]] = []  # (indent, scope, is_record)

    def ctx_scopes(row):
        enclosing = [s for s in pp if s.start_row < row <= s.end_row]
        enclosing += [sc for _, sc, _ in scopes]
        return sorted(enclosing, key=lambda sc: sc.start_row)

    r = 0
    while r < len(L.lines):
        line = L.lines[r]
        ind = _indent_of(line)
        while scopes and r > scopes[-1][1].end_row:
            scopes.pop()
        in_record = bool(scopes) and scopes[-1][2]

        if _C_TYPEDEF.match(line):
            brow = _c_body_kind(L, r)
            end = _brace_block_end(L, brow) if brow is not None else _stmt_end(L, r)
            stmt = "\n".join(L.lines[r : end + 1])
            if brow is not None or "(" not in stmt:  # skip fn-pointer typedefs
                m = re.search(r"([A-Za-z_]\w*)\s*;\s*$", L.lines[end])
                if m:
                    before, after = _context(ctx_scopes(r), r, end)
                    out.append(Obj(m.group(1), "definition.type", r, 0, end,
                                   len(L.lines[end]), L.byte_at(r, 0),
                                   L.line_end_byte(end), before, after))
            r = end + 1
            continue

        m = _C_STRUCT.match(line)
        if m and not line.rstrip().endswith(";"):
            brow = _c_body_kind(L, r)
            if brow is not None:
                kind = "definition.class" if m.group(2) == "class" else "definition.struct"
                end = _brace_block_end(L, brow)
                before, after = _context(ctx_scopes(r), r, end)
                col = line.find(m.group(2))
                out.append(Obj(m.group(3), kind, r, col, end, len(L.lines[end]),
                               L.byte_at(r, col), L.line_end_byte(end), before, after))
                scopes.append((ind, _Scope(r, end), True))
                r += 1
                continue

        m = _C_ENUM.match(line)
        if m and _c_body_kind(L, r) is not None:
            end = _brace_block_end(L, r)
            before, after = _context(ctx_scopes(r), r, end)
            out.append(Obj(m.group(2), "definition.type", r, ind, end,
                           len(L.lines[end]), L.byte_at(r, ind),
                           L.line_end_byte(end), before, after))
            r = end + 1
            continue

        m = _C_UNION.match(line)
        if m and _c_body_kind(L, r) is not None:
            # (declaration type: (union_specifier name)) @definition.class
            # — the node is the whole declaration, trailing ';' included
            end = _stmt_end(L, r)
            before, after = _context(ctx_scopes(r), r, end)
            out.append(Obj(m.group(2), "definition.class", r, ind, end,
                           len(L.lines[end]), L.byte_at(r, ind),
                           L.line_end_byte(end), before, after))
            r = end + 1
            continue

        if in_record:
            m = _CPP_METHOD_DECL.match(line)
            if m and m.group(1) not in _C_KEYWORDS:
                end = _stmt_end(L, r)
                before, after = _context(ctx_scopes(r), r, end)
                out.append(Obj(m.group(1), "definition.method", r, ind, end,
                               len(L.lines[end]), L.byte_at(r, ind),
                               L.line_end_byte(end), before, after))
                r += 1
                continue

        m = _C_FUNC.match(line)
        if m:
            name = m.group(2)
            base = name.rsplit("::", 1)[-1]
            if base not in _C_KEYWORDS and not base.startswith("~"):
                brow = r if "{" in line else (
                    r + 1 if r + 1 < len(L.lines) and L.lines[r + 1].strip().startswith("{")
                    else -1
                )
                if brow >= 0:
                    end = _brace_block_end(L, brow)
                    before, after = _context(ctx_scopes(r), r, end)
                    kind = ("definition.method" if ("::" in name or in_record)
                            else "definition.function")
                    out.append(Obj(base, kind, r, ind, end, len(L.lines[end]),
                                   L.byte_at(r, ind), L.line_end_byte(end),
                                   before, after))
                    r += 1
                    continue
        r += 1
    return out


_PHP_CLASS = re.compile(r"^(\s*)(?:abstract\s+|final\s+)?(class|interface|trait)\s+([A-Za-z_]\w*)")
_PHP_NS = re.compile(r"^(\s*)namespace\s+([A-Za-z_][\w\\\\]*)")
_PHP_FUNC = re.compile(r"^(\s*)(?:(?:public|private|protected|static)\s+)*function\s+([A-Za-z_]\w*)")
_PHP_FIELD = re.compile(
    r"^(\s*)(?:(?:public|private|protected|static|var|readonly)\s+)+"
    r"[\w\?\\]*\s*\$([A-Za-z_]\w*)"
)


def _scan_php(L: _Lines):
    out = []
    scopes: list[tuple[int, _Scope]] = []
    for r, line in enumerate(L.lines):
        ind = _indent_of(line)
        while scopes and r > scopes[-1][1].end_row:
            scopes.pop()
        m = _PHP_NS.match(line)
        if m:
            # (namespace_definition name: (namespace_name)) @definition.module
            end = _brace_block_end(L, r) if "{" in line else _stmt_end(L, r)
            out.append(Obj(m.group(2), "definition.module", r, ind, end,
                           len(L.lines[end]), L.byte_at(r, ind),
                           L.line_end_byte(end), [], []))
            if "{" in line:
                scopes.append((ind, _Scope(r, end)))
            continue
        m = _PHP_CLASS.match(line)
        if m:
            end = _brace_block_end(L, r)
            before, after = _context([s for _, s in scopes], r, end)
            kind = {"class": "definition.class", "interface": "definition.interface",
                    "trait": "definition.interface"}[m.group(2)]
            col = line.find(m.group(2))
            out.append(Obj(m.group(3), kind, r, col, end, len(L.lines[end]),
                           L.byte_at(r, col), L.line_end_byte(end), before, after))
            if "implements" in line:
                # (class_interface_clause [(name)(qualified_name)] @name)
                # @definition.class_interface_clause — one object per
                # implemented name, node = the clause
                clause_col = line.find("implements")
                tail = line[clause_col + len("implements"):]
                cut = tail.find("{")
                names_part = tail[:cut] if cut != -1 else tail
                clause_end_col = clause_col + len("implements") + len(names_part.rstrip())
                for nm in names_part.split(","):
                    nm = nm.strip()
                    if nm:
                        out.append(Obj(
                            nm, "definition.class_interface_clause", r,
                            clause_col, r, clause_end_col,
                            L.byte_at(r, clause_col),
                            L.byte_at(r, clause_end_col), before, []))
            scopes.append((ind, _Scope(r, end)))
            continue
        m = _PHP_FUNC.match(line)
        if m:
            end = _brace_block_end(L, r)
            before, after = _context([s for _, s in scopes], r, end)
            kind = "definition.method" if scopes else "definition.function"
            out.append(Obj(m.group(2), kind, r, ind, end, len(L.lines[end]),
                           L.byte_at(r, ind), L.line_end_byte(end), before, after))
            continue
        m = _PHP_FIELD.match(line)
        if m and scopes:
            end = _stmt_end(L, r)
            before, after = _context([s for _, s in scopes], r, end)
            out.append(Obj(m.group(2), "definition.field", r, ind, end,
                           len(L.lines[end]), L.byte_at(r, ind),
                           L.line_end_byte(end), before, after))
    return out


_SCANNERS = {
    "python": _scan_python,
    "javascript": _scan_javascript,
    "typescript": _scan_javascript,
    "tsx": _scan_javascript,
    "go": _scan_go,
    "java": _scan_java,
    "csharp": _scan_java,  # same surface syntax for the supported subset
    "rust": _scan_rust,
    "ruby": _scan_ruby,
    "c": _scan_c,
    "cpp": _scan_c,
    "php": _scan_php,
}


def chunk_text(path: str, lang: str, content: str) -> list[Obj]:
    """P1: one file -> objects. Always the whole-file object first
    (name=path, kind='file'), then definitions in source order.

    Definition extraction dispatches grammar-first: when tree_sitter
    AND the language's grammar wheel are importable, the reference's
    own tag queries run over a real parse tree
    (operators/chunker_ts.py — reference parser.py:120-160); otherwise
    the deterministic line scanner below handles the file. Neither
    runtime ships in this sandbox, so tests pin the scanner goldens
    here and the grammar path under a skipif gate."""
    L = _Lines(content)
    b = content.encode("utf-8")
    nl = b.rfind(b"\n")
    last_len = len(b) - nl - 1 if nl != -1 else len(b)
    objs = [
        Obj(path, "file", 0, 0, b.count(b"\n"), last_len, 0, len(b), [], [])
    ]
    defs = None
    if HAVE_TREE_SITTER and content:
        from codebased_spark.operators.chunker_ts import extract_objects_ts

        defs = extract_objects_ts(lang, content)  # None -> no grammar
    if defs is None:
        scanner = _SCANNERS.get(lang)
        defs = scanner(L) if (scanner and content) else []
    defs.sort(key=lambda o: (o.start_row, o.start_col, o.byte_start))
    objs.extend(defs)
    return objs


CHUNK_COLUMNS = [
    "repo", "path", "commit", "lang", "name", "kind",
    "byte_start", "byte_end", "start_row", "start_col", "end_row", "end_col",
    "context_before", "context_after", "sha256", "content",
]

CHUNK_SCHEMA = (
    "repo string, path string, commit string, lang string, name string, "
    "kind string, byte_start long, byte_end long, start_row int, "
    "start_col int, end_row int, end_col int, context_before array<int>, "
    "context_after array<int>, sha256 string, content string"
)


def chunk_objects(corpus: DataFrame) -> DataFrame:
    """mapInPandas UDTF: corpus files -> object documents. The FTS
    content of an object is the byte-range slice of the file
    (codebased/index.py:601); sha256 is the FILE digest (the staleness
    invariant is per file, search.py:440-442)."""

    def batches(it):
        import hashlib

        import pandas as pd

        for pdf in it:
            rows = []
            for repo, path, commit, lang, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"], pdf["content"]
            ):
                content = content or ""
                b = content.encode("utf-8")
                sha = hashlib.sha256(b).hexdigest()
                for o in chunk_text(path, lang, content):
                    rows.append(
                        (repo, path, commit, lang, o.name, o.kind,
                         o.byte_start, o.byte_end, o.start_row, o.start_col,
                         o.end_row, o.end_col, o.context_before, o.context_after,
                         sha, b[o.byte_start:o.byte_end].decode("utf-8", "replace"))
                    )
            yield pd.DataFrame(rows, columns=CHUNK_COLUMNS)

    return corpus.mapInPandas(batches, CHUNK_SCHEMA)
