"""Language fixture sources for real-grammar golden capture.

One canonical (path, lang, source) per reference parser fixture —
the same sources tests/test_chunker_goldens.py pins through the line
scanner (mirroring /root/reference tests/test_parser.py:74-617).
tools/record_ts_goldens.py runs these through the GRAMMAR path
(operators/chunker_ts.extract_objects_ts) in any environment with real
tree-sitter wheels and records the full object lists under
tests/goldens_ts/; tests/test_chunker_ts.py then pins the grammar path
against that recorded REAL output wherever a recording exists
(VERDICT r04 #2).
"""

import textwrap

# key -> (file path, language, source)
FIXTURES: dict[str, tuple[str, str, str]] = {}


def _fx(key: str, path: str, lang: str, src: str, strip: bool = False) -> None:
    src = textwrap.dedent(src)
    FIXTURES[key] = (path, lang, src.strip() if strip else src)


_fx("python_basic", "a.py", "python", '''
    CONSTANT = 1

    class Greeter:
        def hello(self):
            return "hi"

    def main():
        pass
    ''', strip=True)

_fx("python_decorated", "src/deco.py", "python", """
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
    """)

_fx("cpp_header", "src/shapes.h", "cpp", """
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
    """)

_fx("c_header_as_cpp", "src/shapes.h", "cpp", """
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
    """)

_fx("rust_shapes", "src/main.rs", "rust", """
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
    """)

_fx("rust_full", "src/lib.rs", "rust", """
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
    """)

_fx("csharp_main", "src/Main.cs", "csharp", """
    public class Point {
        public double X { get; set; }
        public double Y { get; set; }
    }

    public static void Main() {
        var p = new Point { X = 1, Y = 2 };
        Console.WriteLine("Hello, world!");
    }
    """)

_fx("go_main", "src/main.go", "go", """
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
    """)

_fx("java_main", "src/Main.java", "java", """
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
    """)

_fx("ruby_main", "src/main.rb", "ruby", """
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
    """)

_fx("ruby_alias", "src/geo.rb", "ruby", """
    module Geometry
        class Shapes::Circle
            def area
                0
            end
            alias size area
        end
    end
    """)

_fx("php_main", "src/main.php", "php", """
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
    """)

_fx("php_namespace", "src/circle.php", "php", """
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
    """)

_fx("c_union", "src/u.c", "c", """
    union Bits {
        int i;
        float f;
    } value;

    int main(void) {
        return 0;
    }
    """)

_fx("typescript_full", "src/shapes.ts", "typescript", """
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
    """)


def obj_record(o) -> dict:
    """A chunker Obj as a plain JSON-stable dict (the recorded-golden
    wire format)."""
    return {
        "name": o.name,
        "kind": o.kind,
        "start_row": o.start_row,
        "start_col": o.start_col,
        "end_row": o.end_row,
        "end_col": o.end_col,
        "byte_start": o.byte_start,
        "byte_end": o.byte_end,
        "context_before": list(o.context_before),
        "context_after": list(o.context_after),
    }
