"""Hashed linear quality classifier (functions/classifier.py) — the
bulk hash parity runs through the harness oracle; these pin the
contract edges."""

from __future__ import annotations

import pytest

from openetlagent_spark.functions.classifier import (
    classifier_score,
    hashed_classifier_weights,
)


def test_score_matches_python_mirror(spark):
    """The Spark fold equals a plain Python left fold over the same
    md5 buckets — float-for-float."""
    import hashlib

    w = hashed_classifier_weights()
    df = spark.createDataFrame(
        [(1, "the quick Brown fox"), (2, "  padded   text  "), (3, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in classifier_score(df, "doc_id", "text").collect()}

    def pyscore(text):
        toks = __import__("re").split(r"\s+", text.strip().lower())
        acc = 0.0
        for t in toks:
            acc += w[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 1024]
        return acc / len(toks)

    assert got[1].score == pyscore("the quick Brown fox")
    assert got[2].score == pyscore("  padded   text  ")
    assert got[2].n_tokens == 2
    assert got[3].score is None and got[3].n_tokens is None
    assert got[3].clf_pass is None  # NULL gate, not False


def test_custom_weights_and_threshold(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "c")], "doc_id long, text string")
    import hashlib

    def b(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 4

    w = [0.0] * 4
    w[b("a")] = 1.0
    w[b("b")] = 1.0
    w[b("c")] = -1.0
    got = {
        r.doc_id: r
        for r in classifier_score(
            df, dim=4, weights=w, threshold=0.5
        ).collect()
    }
    assert got[1].score == 1.0 and got[1].clf_pass
    assert got[2].score == -1.0 and not got[2].clf_pass
    with pytest.raises(ValueError, match="weights"):
        classifier_score(df, dim=8, weights=w)


def test_weights_are_grid_exact_and_seeded():
    w1 = hashed_classifier_weights(dim=64, seed=7)
    w2 = hashed_classifier_weights(dim=64, seed=7)
    w3 = hashed_classifier_weights(dim=64, seed=8)
    assert w1 == w2 and w1 != w3
    assert all(v * (1 << 20) == int(v * (1 << 20)) for v in w1)
    assert all(-1.0 <= v < 1.0 for v in w1)


def test_keep_all_and_collision_guard(spark):
    df = spark.createDataFrame([(1, "a b", "s")], "doc_id long, text string, src string")
    out = classifier_score(df, keep_all=True).collect()[0]
    assert set(out.asDict()) == {"doc_id", "text", "src", "n_tokens", "score", "clf_pass"}
    bad = df.withColumnRenamed("src", "score")
    with pytest.raises(ValueError, match="collide"):
        classifier_score(bad, keep_all=True)


def test_weight_artifact_parquet_round_trip(spark, tmp_path):
    """save → load through parquet reproduces the list float-for-float,
    and scoring with the loaded list equals scoring with the original."""
    from openetlagent_spark.functions.classifier import (
        load_classifier_weights,
        save_classifier_weights,
    )

    w = hashed_classifier_weights(dim=64, seed=9)
    path = str(tmp_path / "weights")
    save_classifier_weights(w, path, spark=spark)
    loaded = load_classifier_weights(path, spark=spark, dim=64)
    assert loaded == w
    df = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, text string")
    a = classifier_score(df, dim=64, weights=w).collect()[0]
    b = classifier_score(df, dim=64, weights=loaded).collect()[0]
    assert a.score == b.score and a.clf_pass == b.clf_pass


def test_weight_artifact_json_round_trip(tmp_path):
    from openetlagent_spark.functions.classifier import (
        load_classifier_weights,
        save_classifier_weights,
    )

    w = hashed_classifier_weights(dim=16, seed=3)
    path = str(tmp_path / "weights.json")
    save_classifier_weights(w, path)
    assert load_classifier_weights(path, dim=16) == w
    with pytest.raises(ValueError, match="got 16 weights for dim=8"):
        load_classifier_weights(path, dim=8)


def test_weight_artifact_validation(spark, tmp_path):
    """Sparse / duplicated / out-of-range bucket tables and non-list
    JSON are rejected — a hole would silently mis-score."""
    from openetlagent_spark.functions.classifier import load_classifier_weights

    sparse = str(tmp_path / "sparse")
    spark.createDataFrame(
        [(0, 0.5), (2, 0.25)], "bucket int, weight double"
    ).write.parquet(sparse)
    with pytest.raises(ValueError, match="missing"):
        load_classifier_weights(sparse, spark=spark, dim=4)
    dup = str(tmp_path / "dup")
    spark.createDataFrame(
        [(0, 0.5), (0, 0.25)], "bucket int, weight double"
    ).write.parquet(dup)
    with pytest.raises(ValueError, match="duplicate bucket"):
        load_classifier_weights(dup, spark=spark, dim=2)
    badjson = str(tmp_path / "bad.json")
    with open(badjson, "w") as f:
        f.write('{"not": "a list"}')
    with pytest.raises(ValueError, match="JSON list"):
        load_classifier_weights(badjson)


def test_flow_op_weights_path(spark, tmp_path):
    """The YAML surface loads the artifact: a weights_path op scores
    with the FILE's weights, not the seeded stub (different values)."""
    from openetlagent_spark.functions.classifier import save_classifier_weights
    from openetlagent_spark.model import parse_operation
    from openetlagent_spark.operators import apply_classifier_score

    w = [0.5] * 16  # constant table: every doc scores 0.5 exactly
    path = str(tmp_path / "w.json")
    save_classifier_weights(w, path)
    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    op = parse_operation({
        "operation_type": "classifier_score", "dim": 16,
        "weights_path": path, "threshold": 0.4,
    })
    got = apply_classifier_score(df, op).collect()[0]
    assert got.score == 0.5 and got.clf_pass
    stub = apply_classifier_score(
        df, parse_operation({"operation_type": "classifier_score", "dim": 16})
    ).collect()[0]
    assert stub.score != 0.5


def test_train_hand_computed_one_round(spark):
    """One round from zero weights on a 2-doc corpus: every doc is
    misclassified at w=0 (margin 0), so w[b] = (Σ y·count_b)/2^lr_bits
    exactly — checked bucket by bucket against a Python mirror."""
    import hashlib

    from openetlagent_spark.functions.classifier import classifier_train

    df = spark.createDataFrame(
        [(1, "good good great", 1), (2, "bad awful", -1)],
        "doc_id long, text string, label int",
    )
    w = classifier_train(df, "text", "label", dim=16, iters=1, lr_bits=4)

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 16

    expect = [0.0] * 16
    for tok, y in [("good", 1), ("good", 1), ("great", 1), ("bad", -1), ("awful", -1)]:
        expect[bucket(tok)] += y / 16
    assert w == expect


def test_train_converges_on_separable_corpus(spark):
    """Vocab-disjoint classes are linearly separable; training must
    reach zero disagreement with the labels (and beat the all-zero
    start, which misclassifies everything)."""
    from openetlagent_spark.functions.classifier import (
        classifier_score,
        classifier_train,
    )

    rows = []
    for i in range(60):
        if i % 3 == 0:
            rows.append((i, f"bad awful worse junk{i % 5}", -1))
        else:
            rows.append((i, f"good fine great nice{i % 5}", 1))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w = classifier_train(df, "text", "label", dim=64, iters=4, lr_bits=6)
    scored = classifier_score(
        df.select("doc_id", "text"), "doc_id", "text", dim=64, weights=w
    )
    lab = {r["doc_id"]: r["label"] for r in df.select("doc_id", "label").collect()}
    err = sum(
        1
        for r in scored.collect()
        if (1 if r["score"] >= 0 else -1) != lab[r["doc_id"]]
    )
    assert err == 0


def test_train_halving_schedule_is_exact_binary(spark):
    """Every trained weight is an exact multiple of the FINAL round's
    step 2^-(lr_bits+iters-1) — the exactness invariant the oracle
    depends on."""
    from openetlagent_spark.functions.classifier import classifier_train

    df = spark.createDataFrame(
        [(i, f"w{i % 7} w{(i + 1) % 7} common", 1 if i % 2 else -1) for i in range(40)],
        "doc_id long, text string, label int",
    )
    w = classifier_train(df, "text", "label", dim=32, iters=3, lr_bits=5)
    scale = 1 << (5 + 3 - 1)
    assert any(v != 0.0 for v in w)
    for v in w:
        assert v * scale == int(v * scale)


def test_train_artifact_scoring_round_trip(spark, tmp_path):
    """train → save → load → score equals scoring with the in-memory
    list (the deployment loop the classifier_train query exercises)."""
    from openetlagent_spark.functions.classifier import (
        classifier_score,
        classifier_train,
        load_classifier_weights,
        save_classifier_weights,
    )

    df = spark.createDataFrame(
        [(i, "alpha beta" if i % 2 else "gamma delta", 1 if i % 2 else -1)
         for i in range(20)],
        "doc_id long, text string, label int",
    )
    w = classifier_train(df, "text", "label", dim=32, iters=2, lr_bits=6)
    path = str(tmp_path / "trained")
    save_classifier_weights(w, path, spark=spark)
    w2 = load_classifier_weights(path, spark=spark, dim=32)
    assert w2 == w
    direct = classifier_score(df.select("doc_id", "text"), dim=32, weights=w).collect()
    loaded = classifier_score(df.select("doc_id", "text"), dim=32, weights=w2).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, loaded))


def test_train_validation(spark):
    from openetlagent_spark.functions.classifier import classifier_train

    df = spark.createDataFrame(
        [(1, "a b", 1), (2, "c d", 0)], "doc_id long, text string, label int"
    )
    with pytest.raises(ValueError, match=r"must be \+1/-1"):
        classifier_train(df, "text", "label", dim=8, iters=1)
    ok = df.where("label = 1")
    with pytest.raises(ValueError, match="dim must be"):
        classifier_train(ok, "text", "label", dim=0)
    with pytest.raises(ValueError, match="iters must be"):
        classifier_train(ok, "text", "label", dim=8, iters=0)
    with pytest.raises(ValueError, match="lr_bits"):
        classifier_train(ok, "text", "label", dim=8, iters=1, lr_bits=60)
    with pytest.raises(ValueError, match="lr_bits"):
        classifier_train(ok, "text", "label", dim=8, iters=20, lr_bits=40)


def test_train_skips_null_text_and_labels(spark):
    """NULL text / NULL label rows contribute nothing — same weights
    as training on the clean subset."""
    from openetlagent_spark.functions.classifier import classifier_train

    clean = [(1, "up up", 1), (2, "down down", -1)]
    noisy = clean + [(3, None, 1), (4, "ignored", None)]
    a = classifier_train(
        spark.createDataFrame(clean, "doc_id long, text string, label int"),
        "text", "label", dim=16, iters=2, lr_bits=4,
    )
    b = classifier_train(
        spark.createDataFrame(noisy, "doc_id long, text string, label int"),
        "text", "label", dim=16, iters=2, lr_bits=4,
    )
    assert a == b


def test_flow_op_classifier_train(spark, tmp_path):
    """classifier_train as a YAML op: trains on the frame's labels,
    scores in place, optionally saves the artifact — and the saved
    artifact re-serves identically through classifier_score
    weights_path."""
    from openetlagent_spark.model import SpecError, parse_operation
    from openetlagent_spark.runner import apply_operations

    rows = [
        (i, "good fine great" if i % 3 else "bad awful junk", 1 if i % 3 else -1)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    artifact = str(tmp_path / "trained.json")
    op = parse_operation({
        "operation_type": "classifier_train", "label_column": "label",
        "dim": 32, "iters": 4, "lr_bits": 6, "save_path": artifact,
    })
    out = apply_operations(df, [op], spark)
    assert set(out.columns) == {"doc_id", "text", "label", "n_tokens", "score", "clf_pass"}
    got = {r["doc_id"]: r["clf_pass"] for r in out.collect()}
    lab = {r[0]: r[2] for r in rows}
    assert all(got[d] == (lab[d] == 1) for d in got)  # separable → perfect

    # the saved artifact serves through the scoring op with equal results
    score_op = parse_operation({
        "operation_type": "classifier_score", "dim": 32,
        "weights_path": artifact, "mode": "annotate",
    })
    served = apply_operations(df.select("doc_id", "text"), [score_op], spark)
    a = {r["doc_id"]: r["score"] for r in out.collect()}
    b = {r["doc_id"]: r["score"] for r in served.collect()}
    assert a == b

    filt = parse_operation({
        "operation_type": "classifier_train", "label_column": "label",
        "dim": 32, "iters": 4, "lr_bits": 6, "mode": "filter",
    })
    kept = apply_operations(df, [filt], spark)
    assert set(kept.columns) == {"doc_id", "text", "label"}
    assert kept.count() == sum(1 for _, _, y in rows if y == 1)

    with pytest.raises(SpecError, match="label_column"):
        parse_operation({"operation_type": "classifier_train"})
    with pytest.raises(SpecError, match="lr_bits"):
        parse_operation({
            "operation_type": "classifier_train", "label_column": "y",
            "iters": 50, "lr_bits": 10,
        })


def test_train_warm_start_equals_uninterrupted(spark, tmp_path):
    """Stop-persist-resume invariance: 2 rounds, JSON artifact round
    trip, 2 more rounds with start_round=2 == one uninterrupted 4-round
    run on the same data — the classifier_warm property at unit scale.
    Resuming with the WRONG start_round (0, restarting the step size)
    must differ."""
    from openetlagent_spark.functions.classifier import (
        classifier_train,
        load_classifier_weights,
        save_classifier_weights,
    )

    rows = [
        (i, f"tok{i % 11} tok{(i + 3) % 11} shared", 1 if i % 3 else -1)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    full = classifier_train(df, "text", "label", dim=32, iters=4, lr_bits=6)
    w1 = classifier_train(df, "text", "label", dim=32, iters=2, lr_bits=6)
    art = str(tmp_path / "w.json")
    save_classifier_weights(w1, art)
    resumed = classifier_train(
        df, "text", "label", dim=32, iters=2, lr_bits=6,
        initial_weights=load_classifier_weights(art, dim=32), start_round=2,
    )
    assert resumed == full
    restarted = classifier_train(
        df, "text", "label", dim=32, iters=2, lr_bits=6,
        initial_weights=w1, start_round=0,
    )
    assert restarted != full


def test_train_warm_start_validation(spark):
    from openetlagent_spark.functions.classifier import classifier_train

    df = spark.createDataFrame([(1, "a", 1)], "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="initial weights"):
        classifier_train(df, "text", "label", dim=8, iters=1, initial_weights=[0.0])
    with pytest.raises(ValueError, match="start_round"):
        classifier_train(df, "text", "label", dim=8, iters=1, start_round=-1)
    with pytest.raises(ValueError, match="lr_bits"):
        classifier_train(
            df, "text", "label", dim=8, iters=10, lr_bits=40, start_round=5
        )


def test_eval_hand_computed_confusion(spark):
    """4-row frame with known score/label layout: every confusion
    cell and every metric checked against hand arithmetic at two
    thresholds (including the >= boundary)."""
    from openetlagent_spark.functions.classifier import classifier_eval

    df = spark.createDataFrame(
        [(0.9, True), (0.5, True), (0.5, False), (0.1, False)],
        "score double, lab boolean",
    )
    out = {r["thr"]: r for r in
           classifier_eval(df, "lab", "score", thresholds=[0.5, 0.95]).collect()}
    at05 = out[0.5]  # pred: 0.9, 0.5, 0.5 -> tp=2 fp=1 fn=0 tn=1
    assert (at05["n"], at05["tp"], at05["fp"], at05["fn"], at05["tn"]) == (4, 2, 1, 0, 1)
    assert at05["accuracy"] == 3 / 4
    assert at05["precision"] == 2 / 3
    assert at05["recall"] == 1.0
    assert at05["f1"] == 4 / 5  # 2*2/(2*2+1+0)
    at95 = out[0.95]  # nothing predicted positive
    assert (at95["tp"], at95["fp"], at95["fn"], at95["tn"]) == (0, 0, 2, 2)
    assert at95["precision"] is None  # tp+fp == 0 -> NULL, not NaN
    assert at95["recall"] == 0.0
    assert at95["f1"] == 0.0
    assert at95["accuracy"] == 1 / 2


def test_eval_null_rows_excluded(spark):
    from openetlagent_spark.functions.classifier import classifier_eval

    df = spark.createDataFrame(
        [(0.9, True), (None, True), (0.2, None)],
        "score double, lab boolean",
    )
    row = classifier_eval(df, "lab", "score", thresholds=[0.5]).collect()[0]
    assert row["n"] == 1 and row["tp"] == 1


def test_eval_all_negative_labels_f1_null(spark):
    """tp=fp=fn=0 -> f1 denominator 0 -> NULL (the guarded branch)."""
    from openetlagent_spark.functions.classifier import classifier_eval

    df = spark.createDataFrame([(0.1, False)], "score double, lab boolean")
    row = classifier_eval(df, "lab", "score", thresholds=[0.5]).collect()[0]
    assert row["f1"] is None and row["precision"] is None
    assert row["recall"] is None  # tp+fn == 0 too
    assert row["accuracy"] == 1.0


def test_eval_validation(spark):
    from openetlagent_spark.functions.classifier import classifier_eval

    df = spark.createDataFrame([(0.1, True)], "score double, lab boolean")
    with pytest.raises(ValueError, match="at least one"):
        classifier_eval(df, "lab", "score", thresholds=[])
    with pytest.raises(ValueError, match="distinct"):
        classifier_eval(df, "lab", "score", thresholds=[0.5, 0.5])


def _separable_corpus(spark, n=90):
    rows = []
    for i in range(n):
        if i % 3 == 0:
            rows.append((i, f"bad awful worse junk{i % 5}", -1))
        else:
            rows.append((i, f"good fine great nice{i % 5}", 1))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_cross_validate_separable_corpus(spark):
    """3-fold CV on a vocab-disjoint corpus: every held-out fold is
    classified perfectly at threshold 0 (the classes share no tokens,
    so any training complement learns the full vocabulary split)."""
    from openetlagent_spark.functions.classifier import classifier_cross_validate

    df = _separable_corpus(spark)
    cv = classifier_cross_validate(
        df, "doc_id", "text", "label", dim=64, iters=4, lr_bits=6, k=3,
        thresholds=[0.0],
    ).collect()
    assert sorted(r["fold"] for r in cv) == [0, 1, 2]
    assert sum(r["n"] for r in cv) == 90  # folds partition the corpus
    for r in cv:
        assert r["n"] > 0
        assert r["fp"] == 0 and r["fn"] == 0
        assert r["accuracy"] == 1.0


def test_cross_validate_deterministic_and_guarded(spark):
    from openetlagent_spark.functions.classifier import classifier_cross_validate

    df = _separable_corpus(spark, n=45)
    a = sorted(map(tuple, classifier_cross_validate(
        df, "doc_id", "text", "label", dim=32, iters=2, lr_bits=6, k=2,
        thresholds=[-0.5, 0.0, 0.5]).collect()))
    b = sorted(map(tuple, classifier_cross_validate(
        df, "doc_id", "text", "label", dim=32, iters=2, lr_bits=6, k=2,
        thresholds=[-0.5, 0.0, 0.5]).collect()))
    assert a == b  # bit-identical reruns
    assert len(a) == 2 * 3  # k folds x |thresholds|
    import pytest

    with pytest.raises(ValueError, match="k must be >= 2"):
        classifier_cross_validate(df, "doc_id", "text", "label", k=1)
