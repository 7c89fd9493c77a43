"""Tests for the Apple crash-line parser and MetricKit flattener.

Fixtures adapted from dsymprocessor/logs_processor_test.go:63-228.
"""

from symspark.functions.apple_parser import is_uuid, parse_apple_line
from symspark.functions.metrickit import flatten_metrickit


def test_apple_line_binary_token():
    line = "3   Chateaux Bufeaux                 0x00000001025a0758 Chateaux Bufeaux + 231256"
    f = parse_apple_line(line)
    assert f is not None
    assert f["lib"] == "Chateaux Bufeaux"
    assert f["tok"] == "Chateaux Bufeaux"
    assert f["addr"] == 231256
    # prefix preserved up to the end of the hex-address group
    assert f["prefix"] == "3   Chateaux Bufeaux                 0x00000001025a0758"


def test_apple_line_uuid_token():
    line = "5   libfoo.dylib   0x00000001 7821F73C-5FDD-409A-B0F1-B3962D7CDD0E + 1234"
    f = parse_apple_line(line)
    assert f is not None
    assert f["tok"] == "7821F73C-5FDD-409A-B0F1-B3962D7CDD0E"
    assert is_uuid(f["tok"])
    assert not is_uuid("Chateaux Bufeaux")


def test_apple_non_matching_lines():
    assert parse_apple_line("Thread 0 Crashed:") is None
    assert parse_apple_line("") is None
    # uppercase hex does not match (regex is lowercase-only, logs_processor.go:210)
    assert parse_apple_line("3   App   0xABCDEF App + 1") is None


def test_metrickit_apple_recursive():
    text = (
        '{"callStacks":[{"threadAttributed":true,"callStackRootFrames":['
        '{"binaryName":"A","binaryUUID":"U1","offsetIntoBinaryTextSegment":100,'
        '"subFrames":[{"binaryName":"B","binaryUUID":"U2","offsetIntoBinaryTextSegment":200}]}]}]}'
    )
    stacks, err = flatten_metrickit(text)
    assert err is None
    assert stacks == [
        [
            {"stack_idx": 0, "bin": "A", "buuid": "U1", "offset": 100},
            {"stack_idx": 0, "bin": "B", "buuid": "U2", "offset": 200},
        ]
    ]


def test_metrickit_flat_otel():
    text = (
        '{"callStacks":[{"callStackFrames":['
        '{"binaryName":"A","binaryUUID":"U1","offsetAddress":7},'
        '{"binaryName":"B","binaryUUID":"U2"}]}]}'
    )
    stacks, err = flatten_metrickit(text)
    assert err is None
    assert stacks == [
        [
            {"stack_idx": 0, "bin": "A", "buuid": "U1", "offset": 7},
            {"stack_idx": 0, "bin": "B", "buuid": "U2", "offset": 0},
        ]
    ]


def test_metrickit_offset_preference():
    # offsetIntoBinaryTextSegment wins over offsetAddress (logs_processor.go:441-447)
    text = (
        '{"callStacks":[{"callStackFrames":['
        '{"binaryName":"A","binaryUUID":"U1","offsetAddress":7,"offsetIntoBinaryTextSegment":9}]}]}'
    )
    stacks, _ = flatten_metrickit(text)
    assert stacks[0][0]["offset"] == 9


def test_metrickit_two_stacks_and_empty():
    text = (
        '{"callStacks":['
        '{"callStackFrames":[{"binaryName":"A","binaryUUID":"U1","offsetAddress":1}]},'
        '{"threadAttributed":false},'
        '{"callStackFrames":[{"binaryName":"A","binaryUUID":"U1","offsetAddress":2}]}]}'
    )
    stacks, _ = flatten_metrickit(text)
    assert [len(s) for s in stacks] == [1, 0, 1]
    assert stacks[0][0]["stack_idx"] == 0 and stacks[2][0]["stack_idx"] == 2


def test_metrickit_invalid_json():
    stacks, err = flatten_metrickit('{"callStacks": [}')
    assert stacks is None and err.startswith("invalid MetricKit JSON")
