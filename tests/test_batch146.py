"""Batch-146: extraction error-locality and status-by-payload audits."""

SF = "/root/testdata/sf0.001"


def test_extract_error_locality_invariants(ray_session):
    import __ray_entry__ as e

    out = e.queries()["extract_error_locality"](SF)
    assert (out["n_err"] <= out["n_turns"]).all()
    assert (out["max_err_run"] <= out["n_err"]).all()
    assert (out["n_err_runs"] <= out["n_err"]).all()
    # a run exists iff an error exists
    assert ((out["n_err"] > 0) == (out["n_err_runs"] > 0)).all()
    # the t1 corpus plants parse failures
    assert int(out["n_err"].sum()) > 0


def test_extract_status_by_payload_reconciles(ray_session):
    import __ray_entry__ as e

    by_pk = e.queries()["extract_status_by_payload"](SF)
    metrics = e.queries()["extract_metrics"](SF)
    # the payload-kind split re-aggregates to the headline metrics
    roll = (
        by_pk.groupby("parse_status", as_index=False)
        .agg(n_turns=("n_turns", "sum"),
             sum_bytes_decoded=("sum_bytes_decoded", "sum"))
        .sort_values("parse_status")
        .reset_index(drop=True)
    )
    m = metrics.sort_values("parse_status").reset_index(drop=True)
    assert (roll["n_turns"].to_numpy() == m["n_turns"].to_numpy()).all()
    assert (
        roll["sum_bytes_decoded"].to_numpy()
        == m["sum_bytes_decoded"].to_numpy()
    ).all()
