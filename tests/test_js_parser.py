"""Golden corpus tests for the JS stack-trace parser.

Fixtures adapted from the reference's parser corpus
(sourcemapprocessor/stack_trace_parser_test.go:20-888), which itself adapts
the MIT-licensed TraceKit browser corpus.  Each case asserts exact
(url, func, line, col) per frame plus mode/name/message.
"""

from symspark.functions.js_parser import UNKNOWN_FUNCTION, compute_stack_trace

U = UNKNOWN_FUNCTION


def frames(result):
    return [(f["url"], f["func"], f["line"], f["col"]) for f in result["frames"]]


def ok(name, msg, stack):
    result, err = compute_stack_trace(name, msg, stack)
    assert err is None, err
    return result


def test_safari_6():
    r = ok("TypeError", "'null' is not an object (evaluating 'x.undef')",
           "@http://path/to/file.js:48\n"
           "dumpException3@http://path/to/file.js:52\n"
           "onclick@http://path/to/file.js:82\n"
           "[native code]")
    assert r["mode"] == "stack"
    assert frames(r) == [
        ("http://path/to/file.js", U, 48, None),
        ("http://path/to/file.js", "dumpException3", 52, None),
        ("http://path/to/file.js", "onclick", 82, None),
        ("[native code]", U, None, None),
    ]


def test_safari_8_eval():
    r = ok("ReferenceError", "x",
           "eval code\n"
           "eval@[native code]\n"
           "foo@http://path/to/file.js:58:21\n"
           "bar@http://path/to/file.js:109:91")
    assert frames(r) == [
        ("[native code]", "eval", None, None),
        ("http://path/to/file.js", "foo", 58, 21),
        ("http://path/to/file.js", "bar", 109, 91),
    ]


def test_firefox_3():
    r = ok("TypeError", "this.undef is not a function",
           "()@http://127.0.0.1:8000/js/stacktrace.js:44\n"
           "(null)@http://127.0.0.1:8000/js/stacktrace.js:31\n"
           "printStackTrace()@http://127.0.0.1:8000/js/stacktrace.js:18\n"
           "bar(1)@http://127.0.0.1:8000/js/file.js:13\n"
           "foo()@http://127.0.0.1:8000/js/file.js:20\n"
           "@http://127.0.0.1:8000/js/file.js:24\n")
    assert frames(r) == [
        ("http://127.0.0.1:8000/js/stacktrace.js", U, 44, None),
        ("http://127.0.0.1:8000/js/stacktrace.js", U, 31, None),
        ("http://127.0.0.1:8000/js/stacktrace.js", "printStackTrace", 18, None),
        ("http://127.0.0.1:8000/js/file.js", "bar", 13, None),
        ("http://127.0.0.1:8000/js/file.js", "foo", 20, None),
        ("http://127.0.0.1:8000/js/file.js", U, 24, None),
    ]


def test_firefox_31():
    r = ok("Error", "Default error",
           "foo@http://path/to/file.js:41:13\n"
           "bar@http://path/to/file.js:1:1\n"
           ".plugin/e.fn[c]/<@http://path/to/file.js:1:1\n")
    assert frames(r) == [
        ("http://path/to/file.js", "foo", 41, 13),
        ("http://path/to/file.js", "bar", 1, 1),
        ("http://path/to/file.js", ".plugin/e.fn[c]/<", 1, 1),
    ]


def test_firefox_43_eval():
    r = ok("Error", "message string",
           "baz@http://localhost:8080/file.js line 26 > eval line 2 > eval:1:30\n"
           "foo@http://localhost:8080/file.js line 26 > eval:2:96\n"
           "@http://localhost:8080/file.js line 26 > eval:4:18\n"
           "speak@http://localhost:8080/file.js:26:17\n"
           "@http://localhost:8080/file.js:33:9")
    assert frames(r) == [
        ("http://localhost:8080/file.js", "baz", 26, None),
        ("http://localhost:8080/file.js", "foo", 26, None),
        ("http://localhost:8080/file.js", U, 26, None),
        ("http://localhost:8080/file.js", "speak", 26, 17),
        ("http://localhost:8080/file.js", U, 33, 9),
    ]


def test_firefox_50_resource_url():
    r = ok("TypeError", "x",
           "render@resource://path/data/content/bundle.js:5529:16\n"
           "wrapped@resource://path/data/content/bundle.js:7270:25")
    assert frames(r) == [
        ("resource://path/data/content/bundle.js", "render", 5529, 16),
        ("resource://path/data/content/bundle.js", "wrapped", 7270, 25),
    ]


def test_chrome_15():
    r = ok("TypeError", "Object #<Object> has no method 'undef'",
           "TypeError: Object #<Object> has no method 'undef'\n"
           "    at bar (http://path/to/file.js:13:17)\n"
           "    at bar (http://path/to/file.js:16:5)\n"
           "    at foo (http://path/to/file.js:20:5)\n"
           "    at http://path/to/file.js:24:4")
    assert r["name"] == "TypeError"
    assert frames(r) == [
        ("http://path/to/file.js", "bar", 13, 17),
        ("http://path/to/file.js", "bar", 16, 5),
        ("http://path/to/file.js", "foo", 20, 5),
        ("http://path/to/file.js", U, 24, 4),
    ]


def test_chrome_36_port_numbers():
    r = ok("Error", "Default error",
           "Error: Default error\n"
           "    at dumpExceptionError (http://localhost:8080/file.js:41:27)\n"
           "    at HTMLButtonElement.onclick (http://localhost:8080/file.js:107:146)\n"
           "    at I.e.fn.(anonymous function) [as index] (http://localhost:8080/file.js:10:3651)")
    assert frames(r) == [
        ("http://localhost:8080/file.js", "dumpExceptionError", 41, 27),
        ("http://localhost:8080/file.js", "HTMLButtonElement.onclick", 107, 146),
        ("http://localhost:8080/file.js", "I.e.fn.(anonymous function) [as index]", 10, 3651),
    ]


def test_chrome_webpack():
    r = ok("TypeError", "x",
           "TypeError: Cannot read property 'error' of undefined\n"
           "   at TESTTESTTEST.eval(webpack:///./src/components/test/test.jsx?:295:108)\n"
           "   at TESTTESTTEST.render(webpack:///./src/components/test/test.jsx?:272:32)")
    assert frames(r) == [
        ("webpack:///./src/components/test/test.jsx?", "TESTTESTTEST.eval", 295, 108),
        ("webpack:///./src/components/test/test.jsx?", "TESTTESTTEST.render", 272, 32),
    ]


def test_chrome_48_nested_eval():
    r = ok("Error", "message string",
           "Error: message string\n"
           "at baz (eval at foo (eval at speak (http://localhost:8080/file.js:21:17)), <anonymous>:1:30)\n"
           "at foo (eval at speak (http://localhost:8080/file.js:21:17), <anonymous>:2:96)\n"
           "at eval (eval at speak (http://localhost:8080/file.js:21:17), <anonymous>:4:18)\n"
           "at Object.speak (http://localhost:8080/file.js:21:17)\n"
           "at http://localhost:8080/file.js:31:13\n")
    assert frames(r) == [
        ("http://localhost:8080/file.js", "baz", 21, 17),
        ("http://localhost:8080/file.js", "foo", 21, 17),
        ("http://localhost:8080/file.js", "eval", 21, 17),
        ("http://localhost:8080/file.js", "Object.speak", 21, 17),
        ("http://localhost:8080/file.js", U, 31, 13),
    ]


def test_chrome_48_blob():
    r = ok("Error", "Error: test",
           "Error: test\n"
           "    at Error (native)\n"
           "    at s (blob:http%3A//localhost%3A8080/abfc40e9-4742-44ed-9dcd-af8f99a29379:31:29146)\n"
           "    at blob:http%3A//localhost%3A8080/d4eefe0f-361a-4682-b217-76587d9f712a:15:10978")
    assert frames(r) == [
        ("(native)", "Error", None, None),
        ("blob:http%3A//localhost%3A8080/abfc40e9-4742-44ed-9dcd-af8f99a29379", "s", 31, 29146),
        ("blob:http%3A//localhost%3A8080/d4eefe0f-361a-4682-b217-76587d9f712a", U, 15, 10978),
    ]


def test_chrome_native_no_location():
    r = ok("TypeError", "error", "error\n at Array.forEach (native)")
    assert frames(r) == [("(native)", "Array.forEach", None, None)]


def test_ie10():
    r = ok("TypeError", "x",
           "TypeError: Unable to get property 'undef' of undefined or null reference\n"
           "   at Anonymous function (http://path/to/file.js:48:13)\n"
           "   at foo (http://path/to/file.js:46:9)\n"
           "   at bar (http://path/to/file.js:82:1)")
    assert frames(r) == [
        ("http://path/to/file.js", "Anonymous function", 48, 13),
        ("http://path/to/file.js", "foo", 46, 9),
        ("http://path/to/file.js", "bar", 82, 1),
    ]


def test_ie11_eval():
    r = ok("ReferenceError", "'getExceptionProps' is undefined",
           "ReferenceError: 'getExceptionProps' is undefined\n"
           "   at eval code (eval code:1:1)\n"
           "   at foo (http://path/to/file.js:58:17)\n"
           "   at bar (http://path/to/file.js:109:1)")
    assert frames(r) == [
        ("eval code", "eval code", 1, 1),
        ("http://path/to/file.js", "foo", 58, 17),
        ("http://path/to/file.js", "bar", 109, 1),
    ]


def test_opera_9_message():
    result, err = compute_stack_trace(
        "TypeError",
        "Statement on line 44: Type mismatch\n"
        "Backtrace:\n"
        "  Line 44 of linked script http://path/to/file.js\n"
        "    this.undef();\n"
        "  Line 31 of linked script http://path/to/file.js\n"
        "    ex = ex || this.createException();",
        "",
    )
    assert err is None
    assert result["mode"] == "multiline"
    assert result["message"] == "Statement on line 44: Type mismatch"
    assert frames(result) == [
        ("http://path/to/file.js", U, 44, None),
        ("http://path/to/file.js", U, 31, None),
    ]


def test_opera_10():
    r = ok("Error", "x",
           "  Line 42 of linked script http://path/to/file.js\n"
           "                this.undef();\n"
           "  Line 27 of linked script http://path/to/file.js\n"
           "            ex = ex || this.createException();\n"
           "  Line 18 of linked script http://path/to/file.js: In function printStackTrace\n"
           "        var p = new printStackTrace.implementation(), result = p.run(ex);\n"
           "  Line 4 of inline#1 script in http://path/to/file.js: In function bar\n"
           "             printTrace(printStackTrace());\n")
    assert r["mode"] == "stacktrace"
    assert frames(r) == [
        ("http://path/to/file.js", U, 42, None),
        ("http://path/to/file.js", U, 27, None),
        ("http://path/to/file.js", "printStackTrace", 18, None),
        ("http://path/to/file.js", "bar", 4, None),
    ]


def test_opera_11():
    r = ok("Error", "'this.undef' is not a function",
           "Error thrown at line 42, column 12 in <anonymous function: createException>() in http://path/to/file.js:\n"
           "    this.undef();\n"
           "called from line 27, column 8 in <anonymous function: run>(ex) in http://path/to/file.js:\n"
           "    ex = ex || this.createException();\n"
           "called from line 15, column 3 in http://path/to/file.js:\n"
           "    foo();")
    assert r["mode"] == "stacktrace"
    assert frames(r) == [
        ("http://path/to/file.js", "createException", 42, 12),
        ("http://path/to/file.js", "run", 27, 8),
        ("http://path/to/file.js", U, 15, 3),
    ]


def test_opera_12():
    r = ok("Error", "Cannot convert 'x' to object",
           "Error thrown at line 48, column 12 in <anonymous function>(x) in http://localhost:8000/ExceptionLab.html:\n"
           "    x.undef();\n"
           "called from line 46, column 8 in dumpException3() in http://localhost:8000/ExceptionLab.html:\n"
           "    dumpException((function(x) {\n"
           "called from line 1, column 0 in <anonymous function>(event) in http://localhost:8000/ExceptionLab.html:\n"
           "    dumpException3();")
    assert frames(r) == [
        ("http://localhost:8000/ExceptionLab.html", "<anonymous function>", 48, 12),
        ("http://localhost:8000/ExceptionLab.html", "dumpException3", 46, 8),
        ("http://localhost:8000/ExceptionLab.html", "<anonymous function>", 1, 0),
    ]


def test_phantomjs():
    r = ok("Error", "foo",
           "Error: foo\n"
           "    at file:///path/to/file.js:878\n"
           "    at foo (http://path/to/file.js:4283)\n"
           "    at http://path/to/file.js:4287")
    assert frames(r) == [
        ("file:///path/to/file.js", U, 878, None),
        ("http://path/to/file.js", "foo", 4283, None),
        ("http://path/to/file.js", U, 4287, None),
    ]


def test_react_native_android_production():
    r = ok("Error", "Error: test",
           "Error: test\n"
           "value@index.android.bundle:12:1917\n"
           "onPress@index.android.bundle:12:2336\n"
           "[native code]\n"
           "_performSideEffectsForTransition@index.android.bundle:252:8508")
    assert frames(r) == [
        ("index.android.bundle", "value", 12, 1917),
        ("index.android.bundle", "onPress", 12, 2336),
        ("[native code]", U, None, None),
        ("index.android.bundle", "_performSideEffectsForTransition", 252, 8508),
    ]


def test_react_native_address_at():
    bundle = "/Users/u/Example.app/main.jsbundle"
    r = ok("Error", "poke",
           "Error: poke\n"
           f"    at anonymous (address at {bundle}:1:2344117)\n"
           "    at call (native)\n"
           f"    at _with (address at {bundle}:1:1414154)")
    assert frames(r) == [
        (bundle, "anonymous", 1, 2344117),
        ("(native)", "call", None, None),
        (bundle, "_with", 1, 1414154),
    ]


def test_android_react_native_path_urls():
    r = ok("Error", "Error: test",
           "Error: test\n"
           "at render(/home/u/app/src/components/GpsMonitorScene.js:78:24)\n"
           "at child(/home/u/app/node_modules/ReactReconciler.js:68:25)\n")
    assert frames(r) == [
        ("/home/u/app/src/components/GpsMonitorScene.js", "render", 78, 24),
        ("/home/u/app/node_modules/ReactReconciler.js", "child", 68, 25),
    ]


def test_native_frames_bare_file_urls():
    r = ok("Error", "Test error",
           "Error: Test error\n"
           "   at Array.map (native)\n"
           "   at funcA (fileA.js:10:15)\n"
           "   at Array.forEach (native)\n"
           "   at funcB (fileB.js:20:25)")
    assert frames(r) == [
        ("(native)", "Array.map", None, None),
        ("fileA.js", "funcA", 10, 15),
        ("(native)", "Array.forEach", None, None),
        ("fileB.js", "funcB", 20, 25),
    ]


def test_edge_cases():
    # empty stack
    result, err = compute_stack_trace("Error", "Error message", "")
    assert result is None and err
    # unparseable
    result, err = compute_stack_trace(
        "Error", "Error message",
        "This is not a valid stack trace format\nSome random text\nMore random text")
    assert result is None and err

    # query-string URLs
    r = ok("Error", "Test error",
           "Error: Test error\n"
           "    at foo (http://example.com/file.js?v=123:10:5)\n"
           "    at bar (http://example.com/file.js?v=123&debug=true:20:10)")
    assert frames(r) == [
        ("http://example.com/file.js?v=123", "foo", 10, 5),
        ("http://example.com/file.js?v=123&debug=true", "bar", 20, 10),
    ]

    # fragment URLs
    r = ok("Error", "Test error",
           "Error: Test error\n    at foo (http://example.com/file.js#section:10:5)")
    assert frames(r) == [("http://example.com/file.js#section", "foo", 10, 5)]

    # chrome-extension scheme
    r = ok("Error", "Extension error",
           "Error: Extension error\n    at foo (chrome-extension://abc123def456/script.js:10:5)")
    assert frames(r) == [("chrome-extension://abc123def456/script.js", "foo", 10, 5)]

    # missing closing paren
    r = ok("Error", "Test error",
           "Error: Test error\n"
           "    at func (http://example.com/file.js:10:5\n"
           "    at func2 (http://example.com/file2.js:20:1)")
    assert frames(r) == [
        ("http://example.com/file.js", "func", 10, 5),
        ("http://example.com/file2.js", "func2", 20, 1),
    ]

    # non-numeric line number folds into the URL
    r = ok("Error", "Test error",
           "Error: Test error\n    at func (http://example.com/file.js:abc:5)")
    assert frames(r) == [("http://example.com/file.js:abc", "func", 5, None)]

    # non-numeric column
    r = ok("Error", "Test error",
           "Error: Test error\n    at func (http://example.com/file.js:10:xyz)")
    assert frames(r) == [("http://example.com/file.js:10:xyz", "func", None, None)]

    # zero line/col preserved
    r = ok("Error", "Test error",
           "Error: Test error\n"
           "    at func (http://example.com/file.js:0:1)\n"
           "    at func2 (http://example.com/file.js:1:0)")
    assert frames(r) == [
        ("http://example.com/file.js", "func", 0, 1),
        ("http://example.com/file.js", "func2", 1, 0),
    ]

    # max uint32
    m = 4294967295
    r = ok("Error", "Test error",
           f"Error: Test error\n    at func (http://example.com/file.js:{m}:{m})")
    assert frames(r) == [("http://example.com/file.js", "func", m, m)]

    # <anonymous> url + async prefix
    r = ok("Error", "test error",
           "Error: test error\n"
           "    at JSON.parse (<anonymous>)\n"
           "    at foo (http://example.com/bundle.js:1:100)\n"
           "    at async http://example.com/bundle.js:1:200")
    assert frames(r) == [
        ("<anonymous>", "JSON.parse", None, None),
        ("http://example.com/bundle.js", "foo", 1, 100),
        ("http://example.com/bundle.js", "async", 1, 200),
    ]
