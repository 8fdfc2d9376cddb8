#!/usr/bin/env python
"""Worked example: wiring an external LLM client into the pipeline
generator's ``complete: Callable[[str], str]`` contract.

The reference calls litellm directly inside its agent loop
(app/main.py:105 ``completion(model=..., messages=[...])``); this
engine deliberately keeps the LLM client EXTERNAL (generator.py takes
any ``complete`` callable) so the engine has zero network/SDK
dependencies.  This file shows the three adapter shapes a user would
actually deploy — and a deterministic scripted stand-in that runs here
(no LLM SDK in this container), proving the contract end to end.

Run:  PYTHONPATH=/root/repo python examples/litellm_adapter.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --- Adapter 1: litellm (the reference's client, app/main.py:105) ----------
def litellm_complete(prompt: str) -> str:
    """What a litellm user writes.  litellm routes the model string to
    any provider (openai/anthropic/ollama/...)."""
    from litellm import completion  # pip install litellm

    resp = completion(
        model=os.environ.get("ETL_MODEL", "gpt-4o-mini"),
        messages=[{"role": "user", "content": prompt}],
        temperature=0.0,
    )
    return resp.choices[0].message.content


# --- Adapter 2: OpenAI-compatible HTTP endpoint (stdlib only) --------------
def openai_http_complete(prompt: str) -> str:
    """Same contract against any OpenAI-compatible /chat/completions
    endpoint (vLLM, llama.cpp server, ...) with no SDK at all."""
    import json
    import urllib.request

    req = urllib.request.Request(
        os.environ.get("ETL_LLM_URL", "http://localhost:8000/v1/chat/completions"),
        data=json.dumps(
            {
                "model": os.environ.get("ETL_MODEL", "local"),
                "messages": [{"role": "user", "content": prompt}],
                "temperature": 0,
            }
        ).encode(),
        headers={
            "Content-Type": "application/json",
            "Authorization": f"Bearer {os.environ.get('ETL_LLM_KEY', 'none')}",
        },
    )
    with urllib.request.urlopen(req) as r:
        return json.load(r)["choices"][0]["message"]["content"]


# --- Adapter 3: deterministic scripted stand-in (runs in this repo) --------
class ScriptedComplete:
    """Replays a fixed sequence of answers — the test double the repo's
    generator tests use (tests/test_generator.py), and the shape of a
    cached/recorded-completion client."""

    def __init__(self, answers: list[str]):
        self.answers = list(answers)
        self.calls = 0

    def __call__(self, prompt: str) -> str:
        self.calls += 1
        if not self.answers:
            raise RuntimeError("scripted client exhausted")
        return self.answers.pop(0)


def main() -> None:
    """Drive the full generation loop with the scripted adapter against
    the bundled example config — identical code path a litellm adapter
    would exercise."""
    import openetlagent_spark as ela
    from openetlagent_spark.generator import generate_pipeline_step_by_step
    from openetlagent_spark.session import get_spark

    here = os.path.dirname(os.path.abspath(__file__))
    config = ela.load_pipeline_config(os.path.join(here, "config.yaml"))
    out_key = "enriched_orders"
    spark = get_spark("litellm-adapter-example")

    # The recorded "LLM replies": the enrichment pipeline an actual model
    # converges to on this config (one YAML op per turn, then done) —
    # exactly what adapter 1 or 2 would stream back.
    import yaml

    steps = [
        {"operation_type": "bind", "right_file_path": "customers",
         "left_on": "customer_id", "right_on": "customer_id", "how": "left",
         "columns_to_add": ["customer_name", "city", "country", "signup_date"]},
        {"operation_type": "bind", "right_file_path": "products",
         "left_on": "product_name", "right_on": "product_name", "how": "left",
         "columns_to_add": ["category", "cost_price"]},
        {"operation_type": "casting", "input_column": "order_date",
         "target_type": "date", "output_column": "order_date_dt"},
        {"operation_type": "casting", "input_column": "signup_date",
         "target_type": "date", "output_column": "signup_date_dt"},
        {"operation_type": "application", "input_columns": ["unit_price"],
         "function_str": "lambda r: r['unit_price'].replace('$', '')",
         "return_type": "string", "output_column": "_clean_price_"},
        {"operation_type": "casting", "input_column": "_clean_price_",
         "target_type": "float", "output_column": "unit_price_float"},
        {"operation_type": "casting", "input_column": "cost_price",
         "target_type": "float", "output_column": "cost_price_float"},
        {"operation_type": "arithmetic", "input_columns": ["unit_price_float", "quantity"],
         "operator": "*", "output_column": "total_price"},
        {"operation_type": "arithmetic", "input_columns": ["cost_price_float", "quantity"],
         "operator": "*", "output_column": "total_cost"},
        {"operation_type": "arithmetic", "input_columns": ["total_price", "total_cost"],
         "operator": "-", "output_column": "profit"},
        {"operation_type": "comparison", "input_column": "profit",
         "operator": ">", "value": 100, "output_column": "is_high_profit"},
        {"operation_type": "assignation", "value": "UNKNOWN",
         "output_column": "order_status"},
    ]
    answers = ["orders"]
    answers += [f"```yaml\n{yaml.safe_dump([s], sort_keys=False)}```" for s in steps]
    answers.append("```yaml\n- operation_type: done\n```")

    client = ScriptedComplete(answers)
    result = generate_pipeline_step_by_step(spark, config, out_key, complete=client)
    print(f"success={result.success} steps={result.steps_taken} llm_calls={client.calls}")
    for line in result.transcript:
        print(" ", line)
    assert result.success, "generation with the scripted adapter must converge"


if __name__ == "__main__":
    main()
