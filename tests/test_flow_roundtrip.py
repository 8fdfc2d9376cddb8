"""Flow YAML save/load round-trip (reference: save_pipeline_flow at
app/main.py:502-513 persists generated flows for replay on later runs)."""

from __future__ import annotations

from openetlagent_spark.model import (
    load_pipeline_flow,
    parse_operation,
    PipelineFlow,
    save_pipeline_flow,
)

OPS = [
    {"operation_type": "bind", "right_file_path": "customers", "left_on": "cid",
     "right_on": "cid", "how": "inner", "columns_to_add": ["name"]},
    {"operation_type": "switching", "switch_column": "cat",
     "mapping": {"A": "x"}, "default_value": 0.0, "output_column": "o"},
    {"operation_type": "aggregation", "group_by": ["name"],
     "aggregations": {"n": {"column": "*", "agg": "count"}}},
    {"operation_type": "repartition", "columns": ["name"], "num_partitions": 8},
]


def test_flow_yaml_roundtrip(tmp_path):
    flow = PipelineFlow(source="orders", operations=[parse_operation(o) for o in OPS])
    path = str(tmp_path / "flow.yaml")
    save_pipeline_flow(flow, path)
    back = load_pipeline_flow(path)
    assert back.source == "orders"
    assert [op.operation_type for op in back.operations] == [
        "bind", "switching", "aggregation", "repartition"
    ]
    assert back.operations[0].columns_to_add == ["name"]
    assert back.operations[1].mapping == {"A": "x"}
    assert back.operations[2].aggregations == {"n": {"column": "*", "agg": "count"}}
    assert back.operations[3].num_partitions == 8
