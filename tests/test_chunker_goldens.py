"""Remaining reference parser goldens (tests/test_parser.py:74-617):
C++ headers, C headers (dispatched to cpp), Rust, C#, Go, Java, Ruby,
PHP — names, kinds, and context lines exactly as the reference asserts."""

import textwrap

from codebased_spark.operators.chunker import chunk_text


def _nk(objs):
    return [(o.name, o.kind) for o in objs]


def test_cpp_header_golden():
    src = textwrap.dedent(
        """
        #ifndef SHAPES_H
        #define SHAPES_H

        #include <iostream>

        struct Point {
            double x;
            double y;
        };

        class Shape {
        public:
            Shape();
            virtual ~Shape();
            virtual double area() = 0;
        };

        class Circle : public Shape {
        public:
            Circle(double radius);
            double area() override;
        private:
            double radius_;
        };

        class Rectangle : public Shape {
        public:
            Rectangle(double width, double height);
            double area() override;
        private:
            double width_;
            double height_;
        };

        #endif
        """
    )
    objs = chunk_text("src/shapes.h", "cpp", src)
    assert _nk(objs) == [
        ("src/shapes.h", "file"),
        ("Point", "definition.struct"),
        ("Shape", "definition.class"),
        ("area", "definition.method"),
        ("Circle", "definition.class"),
        ("area", "definition.method"),
        ("Rectangle", "definition.class"),
        ("area", "definition.method"),
    ]
    lines = src.split("\n")
    ifndef, endif = lines.index("#ifndef SHAPES_H"), lines.index("#endif")
    _, point, shape, s_area, circle, c_area, rect, r_area = objs
    for o in (point, shape, circle, rect):
        assert o.context_before == [ifndef], o.name
        assert o.context_after == [endif], o.name
    assert s_area.context_before == [ifndef, shape.start_row]
    assert s_area.context_after == [endif, shape.end_row]
    assert c_area.context_before == [ifndef, circle.start_row]
    assert c_area.context_after == [endif, circle.end_row]
    assert r_area.context_before == [ifndef, rect.start_row]
    assert r_area.context_after == [endif, rect.end_row]


def test_c_header_golden():
    src = textwrap.dedent(
        """
        #ifndef SHAPES_H
        #define SHAPES_H

        #include <stdio.h>

        typedef struct {
            double x;
            double y;
        } Point;

        typedef struct Shape Shape;

        typedef double (*AreaFunc)(const Shape*);

        struct Shape {
            AreaFunc area;
        };

        typedef struct {
            Shape base;
            double radius;
        } Circle;

        typedef struct {
            Shape base;
            double width;
            double height;
        } Rectangle;

        double circle_area(const Shape* shape);
        double rectangle_area(const Shape* shape);

        Circle* create_circle(double radius);
        Rectangle* create_rectangle(double width, double height);

        void destroy_shape(Shape* shape);

        #endif
        """
    )
    # .h dispatches to cpp in the reference (tests/test_parser.py:234)
    objs = chunk_text("src/shapes.h", "cpp", src)
    assert _nk(objs) == [
        ("src/shapes.h", "file"),
        ("Point", "definition.type"),
        ("Shape", "definition.type"),
        ("Shape", "definition.struct"),
        ("Circle", "definition.type"),
        ("Rectangle", "definition.type"),
    ]
    lines = src.split("\n")
    ifndef, endif = lines.index("#ifndef SHAPES_H"), lines.index("#endif")
    for o in objs[1:]:
        assert o.context_before == [ifndef], o.name
        assert o.context_after == [endif], o.name


def test_rust_golden():
    src = textwrap.dedent(
        """
        #[derive(Debug)]
        pub struct Point {
            x: f64,
            y: f64,
        }

        impl Point {
            pub fn new(x: f64, y: f64) -> Self {
                Self { x, y }
            }
        }

        fn main() {
            let p = Point::new(1.0, 2.0);
            println!("Hello, world!");
        }
        """
    )
    objs = chunk_text("src/main.rs", "rust", src)
    assert _nk(objs) == [
        ("src/main.rs", "file"),
        ("Point", "definition.struct"),
        ("Point", "definition.struct.impl"),
        ("new", "definition.function"),
        ("main", "definition.function"),
    ]
    _, _point, impl_o, new_o, main_o = objs
    assert new_o.context_before == [impl_o.start_row]
    assert new_o.context_after == [impl_o.end_row]
    assert main_o.context_before == [] and main_o.context_after == []


def test_csharp_golden():
    src = textwrap.dedent(
        """
        public class Point {
            public double X { get; set; }
            public double Y { get; set; }
        }

        public static void Main() {
            var p = new Point { X = 1, Y = 2 };
            Console.WriteLine("Hello, world!");
        }
        """
    )
    objs = chunk_text("src/Main.cs", "csharp", src)
    # reference: only file + class (top-level Main is a grammar error)
    assert _nk(objs) == [("src/Main.cs", "file"), ("Point", "definition.class")]
    assert objs[1].context_before == []


def test_go_golden():
    src = textwrap.dedent(
        """
        package main

        import "fmt"

        type Point struct {
            X float64
            Y float64
        }

        func (*Point) Area() float64 {
            return 0
        }

        func main() {
            p := Point{X: 1, Y: 2}
            fmt.Println("Hello, world!")
        }
        """
    )
    objs = chunk_text("src/main.go", "go", src)
    assert _nk(objs) == [
        ("src/main.go", "file"),
        ("Point", "definition.type"),
        ("Area", "definition.method"),
        ("main", "definition.function"),
    ]
    assert all(o.context_before == [] for o in objs)


def test_java_golden():
    src = textwrap.dedent(
        """
        public class Point {
            public double x;
            public double y;

            public double area() {
                return 0;
            }
        }

        public class Main {
            public static void main(String[] args) {
                Point p = new Point();
                System.out.println("Hello, world!");
            }
        }
        """
    )
    objs = chunk_text("src/Main.java", "java", src)
    assert _nk(objs) == [
        ("src/Main.java", "file"),
        ("Point", "definition.class"),
        ("area", "definition.method"),
        ("Main", "definition.class"),
        ("main", "definition.method"),
    ]
    _, point, area, main_c, main_m = objs
    assert area.context_before == [point.start_row]
    assert area.context_after == [point.end_row]
    assert main_m.context_before == [main_c.start_row]
    assert main_m.context_after == [main_c.end_row]


def test_ruby_golden():
    src = textwrap.dedent(
        """
        class Point
            attr_accessor :x, :y

            def area
                0
            end
        end

        def main
            p = Point.new
            puts "Hello, world!"
        end
        """
    )
    objs = chunk_text("src/main.rb", "ruby", src)
    assert _nk(objs) == [
        ("src/main.rb", "file"),
        ("Point", "definition.class"),
        ("area", "definition.method"),
        ("main", "definition.method"),
    ]
    _, point, area, main_o = objs
    assert area.context_before == [point.start_row]
    assert area.context_after == [point.end_row]
    assert main_o.context_before == [] and main_o.context_after == []


def test_php_golden():
    src = textwrap.dedent(
        """
        <?php

        class Point {
            public double $x;
            public double $y;

            public function area(): float {
                return 0;
            }
        }

        function main() {
            $p = new Point();
            echo "Hello, world!";
        }
        """
    )
    objs = chunk_text("src/main.php", "php", src)
    assert _nk(objs) == [
        ("src/main.php", "file"),
        ("Point", "definition.class"),
        ("x", "definition.field"),
        ("y", "definition.field"),
        ("area", "definition.method"),
        ("main", "definition.function"),
    ]
    _, point, x, y, area, main_o = objs
    for o in (x, y, area):
        assert o.context_before == [point.start_row], o.name
        assert o.context_after == [point.end_row], o.name
    assert main_o.context_before == [] and main_o.context_after == []


def test_python_decorated_and_nested_defs():
    """Constructs absent from the reference fixtures: tree-sitter's
    python query captures (function_definition), so a decorated def's
    object starts at the `def` line (decorators excluded) and nested
    defs are captured with enclosing context."""
    src = textwrap.dedent(
        """
        import functools

        @functools.cache
        def cached(n):
            return n * 2

        class Svc:
            @property
            def value(self):
                return self._v

        def outer():
            x = 1
            def inner():
                return x
            return inner
        """
    )
    objs = chunk_text("src/deco.py", "python", src)
    assert _nk(objs) == [
        ("src/deco.py", "file"),
        ("cached", "definition.function"),
        ("Svc", "definition.class"),
        ("value", "definition.function"),
        ("outer", "definition.function"),
        ("inner", "definition.function"),
    ]
    _, cached, svc, value, outer, inner = objs
    body = src.encode()
    assert body[cached.byte_start:cached.byte_end].startswith(b"def cached")
    assert b"@functools.cache" not in body[cached.byte_start:cached.byte_end]
    assert value.context_before == [svc.start_row]
    assert inner.context_before == [outer.start_row]


def test_typescript_methods_interfaces_namespaces():
    """Reference TS/JS tag-query coverage beyond the fixtures
    (codebased/parser.py:267-359): method_definition, method_signature,
    namespaces, nested arrow declarators, assignment and object-literal
    arrow functions."""
    src = textwrap.dedent(
        """
        export interface Shape {
            area(): number;
            name: string;
        }

        export abstract class Base {
            abstract area(): number;
            describe(): string {
                const tag = this.constructor.name;
                return tag;
            }
        }

        class Circle extends Base {
            constructor(private r: number) {
                super();
            }
            area(): number {
                return 3.14 * this.r * this.r;
            }
            static origin() {
                return new Circle(0);
            }
        }

        namespace Geometry {
            export function unit(): Circle {
                return new Circle(1);
            }
        }

        export const makeShape = (r: number) => new Circle(r);

        function setup() {
            const onReady = async () => {
                return 1;
            };
            const handlers = {
                click: (e: Event) => e,
                close: function (e: Event) {
                    return e;
                },
            };
            window.onresize = () => handlers;
            return onReady;
        }
        """
    )
    objs = chunk_text("src/shapes.ts", "typescript", src)
    assert _nk(objs) == [
        ("src/shapes.ts", "file"),
        ("Shape", "definition.interface"),
        ("area", "definition.method"),            # method_signature
        ("Base", "definition.class"),
        ("area", "definition.method"),            # abstract_method_signature
        ("describe", "definition.method"),
        ("Circle", "definition.class"),
        ("constructor", "definition.method"),
        ("area", "definition.method"),
        ("origin", "definition.method"),
        ("Geometry", "definition.module"),
        ("unit", "definition.function"),
        ("makeShape", "definition.function"),     # top-level arrow declarator
        ("setup", "definition.function"),
        ("onReady", "definition.function"),       # nested arrow declarator
        ("click", "definition.function"),         # pair: arrow
        ("close", "definition.function"),         # pair: function expression
        ("onresize", "definition.function"),      # assignment: member + arrow
    ]
    body = src.encode()
    by = {(o.name, o.kind): o for o in objs}
    # declarator node spans name..value (no 'const', no ';')
    mk = by[("makeShape", "definition.function")]
    assert body[mk.byte_start:mk.byte_end] == b"makeShape = (r: number) => new Circle(r)"
    # methods carry their enclosing class line as context
    desc = by[("describe", "definition.method")]
    base = by[("Base", "definition.class")]
    assert desc.context_before == [base.start_row]
    # namespace members see the namespace scope
    unit = by[("unit", "definition.function")]
    geo = by[("Geometry", "definition.module")]
    assert unit.context_before == [geo.start_row]
    # nested declarator sees the enclosing function line
    onready = by[("onReady", "definition.function")]
    setup_fn = by[("setup", "definition.function")]
    assert onready.context_before == [setup_fn.start_row]


def test_rust_full_tag_query_coverage():
    """Reference rust tag query beyond the shapes golden
    (codebased/parser.py:410-460): enums, unions, type aliases,
    modules, macro_rules!, and the trait-impl/struct-impl split."""
    src = textwrap.dedent(
        """
        pub struct Point {
            x: f64,
        }

        pub enum Shape {
            Circle(f64),
            Rect(f64, f64),
        }

        union Bits {
            i: i32,
            f: f32,
        }

        pub type Meters = f64;

        pub trait Area {
            fn area(&self) -> f64;
        }

        impl Area for Point {
            fn area(&self) -> f64 {
                0.0
            }
        }

        impl Point {
            pub fn new() -> Point {
                Point { x: 0.0 }
            }
        }

        mod geometry {
            pub fn unit() -> f64 {
                1.0
            }
        }

        macro_rules! square {
            ($x:expr) => { $x * $x };
        }
        """
    )
    objs = chunk_text("src/lib.rs", "rust", src)
    assert _nk(objs) == [
        ("src/lib.rs", "file"),
        ("Point", "definition.struct"),
        ("Shape", "definition.class"),        # enum_item
        ("Bits", "definition.class"),         # union_item
        ("Meters", "definition.class"),       # type_item
        ("Area", "definition.interface"),
        # NB the bodyless trait signature `fn area(&self) -> f64;` is a
        # function_signature_item — the reference tags only function_item
        ("Area", "definition.trait.impl"),    # impl Trait for X -> trait name
        ("area", "definition.function"),
        ("Point", "definition.struct.impl"),  # bare impl X
        ("new", "definition.function"),
        ("geometry", "definition.module"),
        ("unit", "definition.function"),
        ("square", "definition.macro"),
    ]
    by = [(o.name, o.kind, o.context_before) for o in objs]
    mod_line = next(o.start_row for o in objs if o.kind == "definition.module")
    unit = next(o for o in objs if o.name == "unit")
    assert unit.context_before == [mod_line]
    alias = next(o for o in objs if o.name == "Meters")
    assert src.encode()[alias.byte_start:alias.byte_end].rstrip().endswith(b";")


def test_c_union_declaration():
    """C_TAG_QUERY: (declaration type: (union_specifier name)) ->
    definition.class; the node spans the whole declaration."""
    src = textwrap.dedent(
        """
        union Bits {
            int i;
            float f;
        } value;

        int main(void) {
            return 0;
        }
        """
    )
    objs = chunk_text("src/u.c", "c", src)
    assert _nk(objs) == [
        ("src/u.c", "file"),
        ("Bits", "definition.class"),
        ("main", "definition.function"),
    ]
    u = objs[1]
    assert src.encode()[u.byte_start:u.byte_end].rstrip().endswith(b"} value;")


def test_ruby_alias_and_scoped_names():
    """Ruby tag query completeness: (alias name) -> definition.method,
    scope_resolution class names tag the LAST constant."""
    src = textwrap.dedent(
        """
        module Geometry
            class Shapes::Circle
                def area
                    0
                end
                alias size area
            end
        end
        """
    )
    objs = chunk_text("src/geo.rb", "ruby", src)
    assert _nk(objs) == [
        ("src/geo.rb", "file"),
        ("Geometry", "definition.module"),
        ("Circle", "definition.class"),
        ("area", "definition.method"),
        ("size", "definition.method"),   # alias
    ]
    alias_o = objs[4]
    assert src.encode()[alias_o.byte_start:alias_o.byte_end].strip() == b"alias size area"


def test_php_namespace_and_interface_clause():
    """PHP tag query completeness: namespace_definition -> module,
    class_interface_clause -> one object per implemented name."""
    src = textwrap.dedent(
        """
        <?php
        namespace App\\Models;

        interface Shape {
            public function area();
        }

        class Circle implements Shape, \\Countable {
            public $radius = 1.0;
            public function area() {
                return 3.14;
            }
        }
        """
    )
    objs = chunk_text("src/circle.php", "php", src)
    assert _nk(objs) == [
        ("src/circle.php", "file"),
        ("App\\Models", "definition.module"),
        ("Shape", "definition.interface"),
        ("area", "definition.method"),
        ("Circle", "definition.class"),
        ("Shape", "definition.class_interface_clause"),
        ("\\Countable", "definition.class_interface_clause"),
        ("radius", "definition.field"),
        ("area", "definition.method"),
    ]
    clause = objs[5]
    assert src.encode()[clause.byte_start:clause.byte_end] == b"implements Shape, \\Countable"
