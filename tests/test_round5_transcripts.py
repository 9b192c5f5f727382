"""Round-5 transcript-family operators: chat-template rendering,
loss-mask spans, role-alternation hygiene, token-budget truncation,
boilerplate turn detection, and sliding conversation windows.

Edge cases the sf0.01 oracle data can't hit: null text/role turns,
single-turn conversations, a budget smaller than the first turn, a
window larger than the conversation, and delivery-order independence.
Plan shapes are pinned (one exchange, no global sort) because these
run over 10^10-turn tables at the target scale.
"""

import pytest

from oregonwaterdataportal_etl_spark.operators import transcripts


TURNS = [
    # conv, idx, text, role
    ("c1", 0, "hello world", "user"),
    ("c1", 1, "hi there", "assistant"),
    ("c1", 2, "run the job", "user"),
    ("c1", 3, "done", "assistant"),
    ("c2", 0, None, None),              # null text AND role
    ("c2", 1, "ok", "assistant"),
    ("c3", 0, "solo", "user"),          # single turn
    ("c4", 0, "a", "user"),             # broken alternation:
    ("c4", 1, "b", "user"),             # user,user,assistant
    ("c4", 2, "c", "assistant"),
]
COLS = ["conv_id", "turn_idx", "text", "role"]


@pytest.fixture(scope="module")
def turns_df(spark):
    return spark.createDataFrame(TURNS, COLS)


def test_render_chat_template_and_span_alignment(spark, turns_df):
    """Rendered string matches the hand-built template; loss-mask
    spans index into it exactly (substring extracted by span ==
    original text), including null turns which render empty but keep
    their (empty) span so downstream offsets never drift."""
    rendered = {
        r["conv_id"]: r["rendered"]
        for r in transcripts.render_chat_template(turns_df).collect()
    }
    assert rendered["c1"] == (
        "<|user|>hello world\x1e<|assistant|>hi there\x1e"
        "<|user|>run the job\x1e<|assistant|>done"
    )
    assert rendered["c2"] == "<||>\x1e<|assistant|>ok"
    assert rendered["c3"] == "<|user|>solo"

    spans = transcripts.loss_mask_spans(
        turns_df, train_roles=("assistant",)
    ).collect()
    texts = {(t[0], t[1]): (t[2] or "") for t in TURNS}
    for r in spans:
        full = rendered[r["conv_id"]]
        assert full[r["start_char"]:r["end_char"]] == texts[
            (r["conv_id"], r["turn_idx"])
        ]
    trains = {(r["conv_id"], r["turn_idx"]): r["train_on"] for r in spans}
    assert trains[("c1", 1)] is True and trains[("c1", 0)] is False
    # null role: isin(null) is null, not True — never trained on
    assert not trains[("c2", 0)]


def test_render_order_independent_one_exchange(spark, turns_df):
    """Assembly is delivery-order independent (in-row struct sort) and
    the plan is a single exchange with no sort before it."""
    shuffled = spark.createDataFrame(
        list(reversed(TURNS)), COLS
    ).repartition(5)
    a = {r["conv_id"]: r["rendered"]
         for r in transcripts.render_chat_template(turns_df).collect()}
    b = {r["conv_id"]: r["rendered"]
         for r in transcripts.render_chat_template(shuffled).collect()}
    assert a == b
    plan = (
        transcripts.render_chat_template(turns_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Sort" not in plan.split("Exchange")[0]


def test_role_alternation_stats(spark, turns_df):
    st = {
        r["conv_id"]: r
        for r in transcripts.role_alternation_stats(turns_df).collect()
    }
    assert st["c1"]["first_role"] == "user"
    assert st["c1"]["same_role_repeats"] == 0
    assert st["c1"]["strictly_alternating"] is True
    assert st["c4"]["same_role_repeats"] == 1
    assert st["c4"]["strictly_alternating"] is False
    # single turn: trivially alternating, zero repeats
    assert st["c3"]["same_role_repeats"] == 0
    assert st["c3"]["strictly_alternating"] is True
    # null role coalesces to "" for comparison, never crashes
    assert st["c2"]["first_role"] == ""


def test_truncate_to_token_budget_prefix_property(spark, turns_df):
    """kept is a prefix: monotone cumsum means once a turn is cut all
    later turns are cut; a budget smaller than the first turn keeps
    nothing; null text counts 1 token (whitespace-split of '')."""
    out = transcripts.truncate_to_token_budget(turns_df, budget=5)
    rows = sorted(
        ((r["conv_id"], r["turn_idx"], r["n_tokens"], r["cum_tokens"],
          r["kept"]) for r in out.collect())
    )
    by_conv = {}
    for c, i, n, cum, kept in rows:
        by_conv.setdefault(c, []).append((i, n, cum, kept))
    # c1: 2,2,3,1 tokens -> cum 2,4,7,8 -> kept T,T,F,F (prefix)
    assert [(k[3]) for k in by_conv["c1"]] == [True, True, False, False]
    for turns in by_conv.values():
        flags = [k[3] for k in turns]
        assert flags == sorted(flags, reverse=True)  # prefix property
    # null text -> "" -> 1 token
    assert by_conv["c2"][0][1] == 1
    tiny = transcripts.truncate_to_token_budget(turns_df, budget=0)
    assert all(not r["kept"] for r in tiny.collect())


def test_boilerplate_turns_hash_only_shuffle(spark, turns_df):
    """Cross-conversation repeats surface by hash; unique turns don't.
    c2 turn-0 (null->'' ) vs nothing else empty, so only planted dups
    appear. The aggregate's input projection carries ONLY the 8-byte
    hash and conv id — the raw text column is pruned before the
    exchange."""
    extra = spark.createDataFrame(
        [("c5", 0, "hello world", "user"), ("c6", 3, "hello world", "x")],
        COLS,
    )
    df = turns_df.union(extra)
    out = transcripts.boilerplate_turns(df, min_convs=2)
    rows = out.collect()
    assert len(rows) == 1  # only "hello world" crosses 2 convs
    assert rows[0]["n_convs"] == 3 and rows[0]["n_occurrences"] == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # two exchanges max (the count-distinct two-phase), BOTH keyed on
    # the 8-byte hash — and the raw text column never rides either:
    # it is pruned before the first exchange.
    assert final.count("Exchange") <= 2
    after_first_exchange = final.split("Exchange")[1]
    assert "text#" not in after_first_exchange


def test_conversation_windows_cover_and_stride(spark, turns_df):
    """Windows tile each conversation: starts every `stride`, trailing
    partial kept, a window larger than the conversation degrades to
    one [0, n) window, every turn position covered."""
    out = transcripts.conversation_windows(
        turns_df, window_turns=2, stride=2
    ).collect()
    w = {}
    for r in out:
        w.setdefault(r["conv_id"], []).append(
            (r["window_id"], r["start_pos"], r["end_pos"])
        )
        assert r["end_pos"] > r["start_pos"]
    assert sorted(w["c1"]) == [(0, 0, 2), (1, 2, 4)]
    assert sorted(w["c3"]) == [(0, 0, 1)]  # window > conv: one partial
    assert sorted(w["c4"]) == [(0, 0, 2), (1, 2, 3)]  # trailing partial
    # overlap case: stride < window
    ov = transcripts.conversation_windows(
        turns_df.filter("conv_id = 'c1'"), window_turns=3, stride=2
    ).collect()
    assert sorted((r["start_pos"], r["end_pos"]) for r in ov) == [
        (0, 3), (2, 4),
    ]
