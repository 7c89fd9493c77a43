from symspark.functions.js_parser import compute_stack_trace  # noqa: F401
from symspark.functions.java_parser import parse_java_stack_trace  # noqa: F401
from symspark.functions.apple_parser import parse_apple_line  # noqa: F401
from symspark.functions.metrickit import flatten_metrickit  # noqa: F401
