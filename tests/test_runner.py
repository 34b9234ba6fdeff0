"""Scenario replay runner + CLI (the reference playground's play loop)."""

from __future__ import annotations

import json
import os

from lets_talk_cdc_change_feed_playground_spark import runner

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REF_FIXTURES = "/root/reference/harness/fixtures"


def test_replay_crud_demo(spark):
    out = runner.replay_scenario(spark, os.path.join(FIXTURES, "crud_demo.json"))
    # lossless lanes pass the comparator verdict; polling is lossy
    assert out["lanes"]["log"]["pass"]
    assert out["lanes"]["trigger"]["pass"]
    assert not out["lanes"]["polling"]["pass"]
    assert out["lanes"]["polling"]["missing"] > 0
    # one op per feed row on the lossless lanes (snapshot row + 7 ops)
    assert out["lanes"]["log"]["events"] == out["ops"] == 8
    assert out["lanes"]["trigger"]["events"] == 8
    # the folded final state matches the scenario's known outcome
    assert out["final_state"]["users|u4"]["name"] == "Barbara"
    assert out["final_state"]["users|u3"]["name"] == "Edsger"
    assert not any(k.endswith("|u2") for k in out["final_state"])


def test_replay_reference_fixture(spark):
    path = os.path.join(REF_FIXTURES, "orders-items-transactions.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference fixtures not available")
    out = runner.replay_scenario(spark, path)
    assert out["lanes"]["log"]["pass"] and out["lanes"]["trigger"]["pass"]
    assert out["missed_deletes_polling"] >= 0
    assert out["final_state_rows"] > 0


def test_cli_emits_json(spark, capsys):
    from lets_talk_cdc_change_feed_playground_spark import cli

    rc = cli.main([os.path.join(FIXTURES, "crud_demo.json"), "--master", "local[4]"])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["lanes"]["log"]["pass"] is True
    assert doc["final_state_rows"] == 3
