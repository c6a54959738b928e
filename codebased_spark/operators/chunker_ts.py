"""Grammar-based chunking via tree-sitter (the P1-P4 grammar path).

The reference extracts definitions with tree-sitter tag queries; this
module ships those queries AS DATA (verbatim from
reference/codebased/parser.py:22-34,193-560 — they are the extraction
spec) and reproduces the reference's match loop (parser.py:136-160)
and ancestor-context walk (parser.py:79-117) over the public
py-tree-sitter API.

It activates per language, only when BOTH the ``tree_sitter`` runtime
and that language's grammar wheel (``tree_sitter_python``, ...) are
importable. Neither ships in this sandbox, so here every lookup
returns None and operators/chunker.py's deterministic line scanner
(golden-tested against the reference's parser fixtures) handles every
file — the dispatch itself is unit-tested, and the grammar path's own
test is skipif-gated on HAVE_TREE_SITTER.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------------------
# Tag queries, keyed by the corpus ``lang`` values the chunker dispatches on.
# Source: reference/codebased/parser.py (cited per query).
# ---------------------------------------------------------------------------

_C_TAG_QUERY = """
(struct_specifier name: (type_identifier) @name body:(_)) @definition.struct
(declaration type: (union_specifier name: (type_identifier) @name)) @definition.class
(function_definition declarator: (function_declarator declarator: (identifier) @name)) @definition.function
(type_definition declarator: (type_identifier) @name) @definition.type
(enum_specifier name: (type_identifier) @name) @definition.type
"""

_CPP_TAG_QUERY = """
(field_declaration (function_declarator declarator: (field_identifier) @name)) @definition.method
(function_definition (function_declarator declarator: (qualified_identifier scope: (namespace_identifier) name: (identifier) @name))) @definition.method
(class_specifier . name: (type_identifier) @name) @definition.class
"""

_JAVASCRIPT_TAG_QUERY = """
(program
    (lexical_declaration
        (variable_declarator
            name: (identifier) @name
            value: (_ !parameters)
        )
    ) @definition.constant)

(program
    (export_statement
        (lexical_declaration
            (variable_declarator
                name: (identifier) @name
                value: (_ !parameters)
            )
        )
    ) @definition.constant)

(program
    (variable_declaration
        (variable_declarator
            name: (identifier) @name
            value: (_ !parameters)
        )
    ) @definition.constant)

(program
    (export_statement
        (variable_declaration
            (variable_declarator
                name: (identifier) @name
                value: (_ !parameters)
            )
        )
    ) @definition.constant)

(method_definition
  name: (property_identifier) @name) @definition.method

(class
  name: (_) @name) @definition.class

(class_declaration
  name: (_) @name) @definition.class

(function_expression
  name: (identifier) @name) @definition.function

(function_declaration
  name: (identifier) @name) @definition.function

(generator_function
  name: (identifier) @name) @definition.function

(generator_function_declaration
  name: (identifier) @name) @definition.function

(variable_declarator
    name: (identifier) @name
    value: [(arrow_function) (function_expression)]) @definition.function

(assignment_expression
  left: [
    (identifier) @name
    (member_expression
      property: (property_identifier) @name)
  ]
  right: [(arrow_function) (function_expression)]) @definition.function

(pair
  key: (property_identifier) @name
  value: [(arrow_function) (function_expression)]) @definition.function
"""

_TYPESCRIPT_ONLY_TAG_QUERY = """
(function_signature
  name: (identifier) @name) @definition.function

(method_signature
  name: (property_identifier) @name) @definition.method

(abstract_method_signature
  name: (property_identifier) @name) @definition.method

(abstract_class_declaration
  name: (type_identifier) @name) @definition.class

(module
  name: (identifier) @name) @definition.module

(interface_declaration
    name: (type_identifier) @name) @definition.interface
"""

TAG_QUERIES: dict[str, str] = {
    # parser.py:403-419
    "python": """
(module (expression_statement (assignment left: (identifier) @name) @definition.constant))

(class_definition
  name: (identifier) @name) @definition.class

(function_definition
  name: (identifier) @name) @definition.function
""",
    # parser.py:422-474
    "rust": """
(struct_item
    name: (type_identifier) @name) @definition.struct

(enum_item
    name: (type_identifier) @name) @definition.class

(union_item
    name: (type_identifier) @name) @definition.class

(type_item
    name: (type_identifier) @name) @definition.class

(function_item
  name: (identifier) @name) @definition.function

(trait_item
    name: (type_identifier) @name) @definition.interface

(mod_item
    name: (identifier) @name) @definition.module

(macro_definition
    name: (identifier) @name) @definition.macro

(impl_item
    trait: (type_identifier) @name) @definition.trait.impl

(impl_item
    type: (type_identifier) @name
    !trait) @definition.struct.impl
""",
    "c": _C_TAG_QUERY,                                   # parser.py:29-35
    "cpp": "\n".join([_C_TAG_QUERY, _CPP_TAG_QUERY]),    # parser.py:22-35,494-500
    # parser.py:505-517
    "csharp": """
(class_declaration name: (identifier) @name) @definition.class
(interface_declaration name: (identifier) @name) @definition.interface
(method_declaration name: (identifier) @name) @definition.method
(namespace_declaration name: (identifier) @name) @definition.module
""",
    # parser.py:522-536
    "go": """
(function_declaration
  name: (identifier) @name) @definition.function
(method_declaration
  name: (field_identifier) @name) @definition.method
(type_declaration (type_spec
    name: (type_identifier) @name)) @definition.type
""",
    # parser.py:541-556
    "java": """
(class_declaration
  name: (identifier) @name) @definition.class

(method_declaration
  name: (identifier) @name) @definition.method

(interface_declaration
  name: (identifier) @name) @definition.interface
""",
    "javascript": _JAVASCRIPT_TAG_QUERY,                 # parser.py:285-360
    # parser.py:263-281,361
    "typescript": "\n".join([_TYPESCRIPT_ONLY_TAG_QUERY, _JAVASCRIPT_TAG_QUERY]),
    "tsx": "\n".join([_TYPESCRIPT_ONLY_TAG_QUERY, _JAVASCRIPT_TAG_QUERY]),
    # parser.py:192-218
    "php": """
(namespace_definition
  name: (namespace_name) @name) @definition.module

(interface_declaration
  name: (name) @name) @definition.interface

(trait_declaration
  name: (name) @name) @definition.interface

(class_declaration
  name: (name) @name) @definition.class

(class_interface_clause [(name) (qualified_name)] @name) @definition.class_interface_clause

(property_declaration
  (property_element (variable_name (name) @name))) @definition.field

(function_definition
  name: (name) @name) @definition.function

(method_declaration
  name: (name) @name) @definition.method
""",
    # parser.py:223-258
    "ruby": """
(method
  name: (_) @name) @definition.method
(singleton_method
  name: (_) @name) @definition.method

(alias
  name: (_) @name) @definition.method

(class
  name: [
    (constant) @name
    (scope_resolution
      name: (_) @name)
  ]) @definition.class
(singleton_class
  value: [
    (constant) @name
    (scope_resolution
      name: (_) @name)
  ]) @definition.class

(module
  name: [
    (constant) @name
    (scope_resolution
      name: (_) @name)
  ]) @definition.module
""",
}

# lang -> (grammar wheel module, language-factory attribute); the split
# typescript/tsx factories mirror parser.py:364-386
_GRAMMAR_MODULES: dict[str, tuple[str, str]] = {
    "python": ("tree_sitter_python", "language"),
    "rust": ("tree_sitter_rust", "language"),
    "c": ("tree_sitter_c", "language"),
    "cpp": ("tree_sitter_cpp", "language"),
    "csharp": ("tree_sitter_c_sharp", "language"),
    "go": ("tree_sitter_go", "language"),
    "java": ("tree_sitter_java", "language"),
    "javascript": ("tree_sitter_javascript", "language"),
    "typescript": ("tree_sitter_typescript", "language_typescript"),
    "tsx": ("tree_sitter_typescript", "language_tsx"),
    "php": ("tree_sitter_php", "language_php"),
    "ruby": ("tree_sitter_ruby", "language"),
}


@lru_cache(maxsize=None)
def _impl(lang: str):
    """(parser, compiled tag query) for ``lang``, or None when the
    runtime or the grammar wheel is unavailable / incompatible."""
    spec = _GRAMMAR_MODULES.get(lang)
    if spec is None or lang not in TAG_QUERIES:
        return None
    try:
        import importlib

        import tree_sitter

        mod = importlib.import_module(spec[0])
        language = tree_sitter.Language(getattr(mod, spec[1])())
        return tree_sitter.Parser(language), language.query(TAG_QUERIES[lang])
    except Exception:
        return None


def have_grammar(lang: str) -> bool:
    return _impl(lang) is not None


def _get_context(node) -> tuple[list[int], list[int]]:
    """Enclosing-scope context lines, the reference's ancestor walk
    (parser.py:79-117): walk named ancestors root->node, collecting
    start lines strictly above the node (context_before) and end lines
    strictly below it (context_after), each strictly inside the
    previous ancestor's span."""
    parents = []
    parent = node.parent
    while parent is not None:
        parents.append(parent)
        parent = parent.parent
    before: list[int] = []
    after: list[int] = []
    start_line, end_line = float("-inf"), float("inf")
    if parents:
        parents.pop()  # the root (file) node never contributes
    while parents:
        p = parents.pop()
        named = bool(p.children_by_field_name("name")) or (
            p.type == "impl_item" and bool(p.children_by_field_name("type"))
        )
        if not named:
            continue
        p_start = p.start_point[0]
        if start_line < p_start < node.start_point[0]:
            before.append(p_start)
        p_end = p.end_point[0]
        if node.end_point[0] < p_end < end_line:
            after.append(p_end)
        start_line = p_start
        end_line = p_end
    return before, after


def extract_objects_ts(lang: str, content: str):
    """Definitions of one file via the grammar path, or None when no
    grammar is available (caller falls back to the line scanner).
    Returns chunker.Obj records — the same shape, kinds, byte ranges,
    coordinates, and context walk as the reference's parse_objects
    (parser.py:120-160)."""
    impl = _impl(lang)
    if impl is None:
        return None
    from codebased_spark.operators.chunker import Obj

    parser, query = impl
    text = content.encode("utf-8")
    tree = parser.parse(text)
    out = []
    for _pattern, captures in query.matches(tree.root_node):
        name_nodes = captures.pop("name", None)
        if not name_nodes:
            continue
        name = name_nodes[0].text.decode("utf-8", "replace")
        for kind, nodes in captures.items():
            for node in nodes:
                before, after = _get_context(node)
                out.append(Obj(
                    name=name,
                    kind=kind,
                    start_row=node.start_point[0],
                    start_col=node.start_point[1],
                    end_row=node.end_point[0],
                    end_col=node.end_point[1],
                    byte_start=node.start_byte,
                    byte_end=node.end_byte,
                    context_before=before,
                    context_after=after,
                ))
    return out
