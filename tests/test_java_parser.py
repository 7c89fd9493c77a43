"""Golden corpus tests for the Java stack-trace parser.

Fixtures adapted from the reference's corpus
(proguardprocessor/stack_trace_parser_test.go:10-349).
"""

import pytest

from symspark.functions.java_parser import (
    ERR_EMPTY,
    ERR_INVALID,
    ERR_NO_FRAMES,
    parse_java_frame,
    parse_java_stack_trace,
)


def els(result):
    out = []
    for e in result["elements"]:
        if "frame" in e:
            f = e["frame"]
            out.append((f["cls"], f["method"], f["src"], f["line"]))
        else:
            out.append(e["raw"])
    return out


def test_standard():
    r, err = parse_java_stack_trace(
        "java.lang.RuntimeException: Something went wrong\n"
        "\tat com.example.MyClass.myMethod(MyClass.java:123)\n"
        "\tat com.example.AnotherClass.anotherMethod(AnotherClass.java:456)"
    )
    assert err is None
    assert r["exception_type"] == "java.lang.RuntimeException"
    assert r["exception_message"] == "Something went wrong"
    assert els(r) == [
        ("com.example.MyClass", "myMethod", "MyClass.java", 123),
        ("com.example.AnotherClass", "anotherMethod", "AnotherClass.java", 456),
    ]


def test_native_and_unknown():
    r, _ = parse_java_stack_trace(
        "E: m\n"
        "\tat com.example.MyClass.method1(MyClass.java:100)\n"
        "\tat com.example.NativeClass.nativeMethod(Native Method)\n"
        "\tat com.example.UnknownClass.unknownMethod(Unknown Source)\n"
        "\tat com.example.MyClass.method(MyClass.java)"
    )
    assert els(r) == [
        ("com.example.MyClass", "method1", "MyClass.java", 100),
        ("com.example.NativeClass", "nativeMethod", "Native Method", -2),
        ("com.example.UnknownClass", "unknownMethod", "Unknown Source", -1),
        ("com.example.MyClass", "method", "MyClass.java", -1),
    ]


def test_explicit_negative_lines():
    r, _ = parse_java_stack_trace(
        "E: m\n"
        "\tat com.example.MyClass.method(MyClass.java:-1)\n"
        "\tat com.example.AnotherClass.method(AnotherClass.java:-2)"
    )
    assert els(r) == [
        ("com.example.MyClass", "method", "MyClass.java", -1),
        ("com.example.AnotherClass", "method", "AnotherClass.java", -2),
    ]


def test_obfuscated_and_inner():
    r, _ = parse_java_stack_trace(
        "E: m\n"
        "\tat a.b.c.d(SourceFile:10)\n"
        "\tat com.example.OuterClass$InnerClass.method(OuterClass.java:100)"
    )
    assert els(r) == [
        ("a.b.c", "d", "SourceFile", 10),
        ("com.example.OuterClass$InnerClass", "method", "OuterClass.java", 100),
    ]


def test_caused_by_preserved():
    r, _ = parse_java_stack_trace(
        "java.lang.RuntimeException: outer\n"
        "\tat com.example.MyClass.method(MyClass.java:100)\n"
        "Caused by: java.lang.IOException: IO error\n"
        "\tat com.example.IOClass.read(IOClass.java:50)"
    )
    assert els(r) == [
        ("com.example.MyClass", "method", "MyClass.java", 100),
        "Caused by: java.lang.IOException: IO error",
        ("com.example.IOClass", "read", "IOClass.java", 50),
    ]


def test_empty_lines_skipped():
    r, _ = parse_java_stack_trace(
        "E: m\n\n\tat com.example.MyClass.method(MyClass.java:100)\n\n"
        "\tat com.example.AnotherClass.method(AnotherClass.java:200)\n"
    )
    assert len(els(r)) == 2


def test_header_variants():
    r, _ = parse_java_stack_trace("E:\n\tat com.example.MyClass.method(MyClass.java:100)")
    assert r["exception_type"] == "E" and r["exception_message"] == ""
    r, _ = parse_java_stack_trace(
        "java.lang.Error: a: b: c\n\tat com.example.MyClass.method(MyClass.java:100)"
    )
    assert r["exception_message"] == "a: b: c"
    r, _ = parse_java_stack_trace(
        "Error   :   spaced\n\tat com.example.MyClass.method(MyClass.java:100)"
    )
    assert r["exception_type"] == "Error" and r["exception_message"] == "spaced"


@pytest.mark.parametrize(
    "text,expected",
    [
        ("", ERR_EMPTY),
        ("java.lang.Error: only header", ERR_NO_FRAMES),
        ("\tat com.example.MyClass.method(MyClass.java:100)", ERR_INVALID),
        ("just some random text without colon-header structure", ERR_INVALID),
    ],
)
def test_errors(text, expected):
    r, err = parse_java_stack_trace(text)
    assert r is None and err == expected


def test_frame_non_frames():
    assert parse_java_frame("not a stack frame") is None
    assert parse_java_frame("") is None
    assert parse_java_frame("com.example.MyClass.method(MyClass.java:100)") is None
