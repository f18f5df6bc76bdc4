"""Transactional + ordering invariants (FIXTURES §5, §6; SURVEY §5).

- Bank-transfer: after applying any transaction-complete prefix of the
  stream, total balance is constant (polardbx-cdc-transfer/.../Bank.java:34-163,
  qatest/binlog/TransferTest.java).
- Randomized DML fuzz: seeded stream with zipf-hot PKs and multi-row txns,
  replayed through last-image merge, verified against an independent
  row-by-row Python oracle (the reference's random qatest strategy,
  qatest/random/*.java, reduced to deterministic seed=42).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from polardbx_cdc_spark.operators import apply as apply_ops
from polardbx_cdc_spark.tso import make_tso

N_ACCOUNTS = 100
INIT_BALANCE = 1000


def _transfer_events(spark, n_txns=500, seed=42):
    """Paired UPDATE rows (debit src / credit dst) sharing one txn_id."""
    rng = random.Random(seed)
    balances = {i: INIT_BALANCE for i in range(N_ACCOUNTS)}
    rows = []
    for t in range(n_txns):
        src, dst = rng.sample(range(N_ACCOUNTS), 2)
        amt = rng.randint(1, 50)
        balances[src] -= amt
        balances[dst] += amt
        for s, (acct, bal) in enumerate([(src, balances[src]), (dst, balances[dst])]):
            rows.append((1_000_000 + t * 10, t, s, "UPDATE", "bank", "accounts", str(acct), float(bal)))
    df = spark.createDataFrame(
        rows,
        "phys long, txn_id long, seq long, action string, db string, tbl string, pk string, value double",
    )
    return df.withColumn("tso", make_tso(F.col("phys"), F.col("txn_id"), F.col("seq"))).drop("phys"), balances


def test_bank_transfer_invariant(spark):
    events, final_balances = _transfer_events(spark)
    snapshot = spark.createDataFrame(
        [(str(i), float(INIT_BALANCE)) for i in range(N_ACCOUNTS)], "pk string, value double"
    )
    # apply every transaction-complete prefix at several cut points
    for cut in (0, 100, 250, 499):
        prefix = events.filter(F.col("txn_id") <= cut)
        state = apply_ops.apply_to_snapshot(snapshot, prefix, keys=("pk",))
        total = state.agg(F.sum("value").alias("s")).collect()[0]["s"]
        assert total == N_ACCOUNTS * INIT_BALANCE, f"balance leaked at prefix {cut}"
    # full replay reaches the generator's final balances exactly
    final = {r["pk"]: r["value"] for r in apply_ops.apply_to_snapshot(snapshot, events, keys=("pk",)).collect()}
    assert final == {str(k): float(v) for k, v in final_balances.items()}


def _fuzz_events(seed=42, n=10_000):
    """FIXTURES §6: 60/30/10 INSERT/UPDATE/DELETE, zipf-ish hot keys,
    occasional multi-row transactions, bounded cross-source skew."""
    rng = random.Random(seed)
    rows = []
    txn = 0
    i = 0
    while i < n:
        size = rng.choice([1] * 99 + [rng.randint(2, 50)])
        base_t = 2_000_000 + txn * 7
        for s in range(size):
            if i >= n:
                break
            r = rng.random()
            action = "INSERT" if r < 0.6 else ("UPDATE" if r < 0.9 else "DELETE")
            # zipf-ish: 80% of traffic on 5% of keys
            pk = rng.randint(0, 49) if rng.random() < 0.8 else rng.randint(50, 999)
            rows.append((base_t, txn, s, action, str(pk), round(rng.uniform(0, 1000), 2)))
            i += 1
        txn += 1
    return rows


def test_fuzz_replay_matches_python_oracle(spark):
    rows = _fuzz_events()
    df = spark.createDataFrame(
        rows, "phys long, txn_id long, seq long, action string, pk string, value double"
    ).withColumn("tso", make_tso(F.col("phys"), F.col("txn_id"), F.col("seq"))).drop("phys")
    df = df.withColumn("db", F.lit("fuzz")).withColumn("tbl", F.lit("t"))

    got = {
        r["pk"]: r["value"]
        for r in apply_ops.replay_to_state(df, keys=("db", "tbl", "pk")).collect()
    }

    # independent oracle: replay rows sequentially in (tso) order
    state: dict[str, float] = {}
    for phys, txn, seq, action, pk, value in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        if action == "DELETE":
            state.pop(pk, None)
        else:
            state[pk] = value
    assert got == state


def test_fuzz_collapse_action_rewrite(spark):
    """collapse_ops action rewrite: chain ending in DELETE → DELETE; chain
    starting with INSERT → INSERT(last image); else UPDATE."""
    rows = _fuzz_events(seed=7, n=2_000)
    df = spark.createDataFrame(
        rows, "phys long, txn_id long, seq long, action string, pk string, value double"
    ).withColumn("tso", make_tso(F.col("phys"), F.col("txn_id"), F.col("seq"))).drop("phys")
    df = df.withColumn("db", F.lit("fuzz")).withColumn("tbl", F.lit("t"))

    got = {r["pk"]: (r["op"], r["value"]) for r in apply_ops.collapse_ops(df).collect()}

    chains: dict[str, list[tuple]] = {}
    for r in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        chains.setdefault(r[4], []).append(r)
    for pk, chain in chains.items():
        first_a, last = chain[0][3], chain[-1]
        expect_op = "DELETE" if last[3] == "DELETE" else ("INSERT" if first_a == "INSERT" else "UPDATE")
        assert got[pk][0] == expect_op, pk
        assert got[pk][1] == last[5], pk
