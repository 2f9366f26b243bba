"""Metrics utilities: binning analysis must inflate errors for correlated
series, and the logger round-trips CSV."""
import numpy as np

from qmcnn_tpu.utils.metrics import (
    MetricsLogger, binned_stderr, integrated_autocorr_time,
)


def ar1(n, rho, rng):
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + rng.normal()
    return x


def test_binned_stderr_iid_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.normal(size=4096)
    naive = x.std(ddof=1) / np.sqrt(x.size)
    assert binned_stderr(x) < 1.6 * naive
    assert integrated_autocorr_time(x) < 2.5


def test_binned_stderr_correlated_inflates():
    rng = np.random.default_rng(1)
    x = ar1(8192, 0.95, rng)
    naive = x.std(ddof=1) / np.sqrt(x.size)
    # true tau_int for AR(1) rho=.95 is (1+rho)/(1-rho) = 39
    assert binned_stderr(x) > 3 * naive
    assert integrated_autocorr_time(x) > 5


def test_binned_stderr_edge_cases():
    assert np.isnan(binned_stderr(np.array([1.0])))
    assert integrated_autocorr_time(np.ones(100)) == 1.0


def test_logger_csv_and_tail(tmp_path):
    path = str(tmp_path / "m.csv")
    lg = MetricsLogger(csv_path=path, print_every=100)
    for i in range(20):
        lg.log(i, {"energy_re": -1.0 - 0.01 * i, "acc": 0.5})
    mean, err = lg.tail_energy(frac=0.5)
    assert -1.2 < mean < -1.0
    lg.close()
    import csv
    rows = list(csv.DictReader(open(path)))
    assert len(rows) == 20 and "energy_re" in rows[0]


def test_analyze_cli(tmp_path, capsys):
    """qmcnn_tpu.analyze reproduces the logger's tail estimate from CSV."""
    import csv as csvmod
    import numpy as np
    from qmcnn_tpu.analyze import main

    rng = np.random.default_rng(0)
    path = tmp_path / "m.csv"
    with open(path, "w", newline="") as f:
        w = csvmod.DictWriter(f, fieldnames=["step", "energy_re", "accept"])
        w.writeheader()
        for i in range(200):
            w.writerow({"step": i + 1,
                        "energy_re": -10.0 + rng.normal(0, 0.1),
                        "accept": 0.5})
    r = main([str(path), "--tail", "0.5", "--n-sites", "4"])
    assert r["rows"] == 200 and r["tail_rows"] == 100
    assert abs(r["energy"] + 10.0) < 0.1
    assert np.isfinite(r["energy_err"]) and r["energy_err"] > 0
    assert abs(r["e_per_site"] + 2.5) < 0.05
    out = capsys.readouterr().out
    assert "e/site" in out and "accept" in out


def test_analyze_zero_variance_extrapolation(tmp_path, capsys):
    """Synthetic runs with E = E0 + c*var + noise: the weighted fit must
    recover E0 at var -> 0 better than the best single run."""
    import csv as csvmod
    import numpy as np
    from qmcnn_tpu.analyze import main

    rng = np.random.default_rng(1)
    e0, c = -50.0, 0.8
    paths = []
    for i, var in enumerate([2.0, 1.0, 0.5, 0.25]):
        path = tmp_path / f"r{i}.csv"
        with open(path, "w", newline="") as f:
            w = csvmod.DictWriter(
                f, fieldnames=["step", "energy_re", "energy_var"])
            w.writeheader()
            for t in range(200):
                w.writerow({"step": t + 1,
                            "energy_re": e0 + c * var + rng.normal(0, 0.02),
                            "energy_var": var + rng.normal(0, 0.01)})
        paths.append(str(path))
    results, x = main(paths + ["--extrapolate", "--n-sites", "100"])
    assert x["n_runs"] == 4
    assert abs(x["energy0"] - e0) < 0.05, x
    assert abs(x["slope"] - c) < 0.1
    best_single = min(r["energy"] for r in results)
    assert abs(x["energy0"] - e0) < abs(best_single - e0)
    out = capsys.readouterr().out
    assert "zero-variance extrapolation" in out and "e/site(var->0)" in out


def test_analyze_extrapolation_two_runs_analytic(tmp_path):
    """n==2 must not crash polyfit(cov=True): the exactly-determined line's
    intercept error is propagated analytically (ADVICE r1)."""
    import csv as csvmod
    import numpy as np
    from qmcnn_tpu.analyze import main

    rng = np.random.default_rng(2)
    paths = []
    for i, (var, e) in enumerate([(2.0, -48.4), (0.5, -49.6)]):
        path = tmp_path / f"r{i}.csv"
        with open(path, "w", newline="") as f:
            w = csvmod.DictWriter(
                f, fieldnames=["step", "energy_re", "energy_var"])
            w.writeheader()
            for t in range(100):
                w.writerow({"step": t + 1,
                            "energy_re": e + rng.normal(0, 0.02),
                            "energy_var": var})
        paths.append(str(path))
    _, x = main(paths + ["--extrapolate"])
    assert x["n_runs"] == 2
    # exact line through the two points: E0 = -50, slope 0.8
    assert abs(x["energy0"] + 50.0) < 0.05
    assert abs(x["slope"] - 0.8) < 0.05
    assert np.isfinite(x["energy0_err"]) and x["energy0_err"] > 0


def test_analyze_robust_tail_excludes_excursions(tmp_path):
    """A transient excursion inside the tail window must not shift the
    robust tail mean/variance (VERDICT r1 item 8)."""
    import csv as csvmod
    import numpy as np
    from qmcnn_tpu.analyze import analyze, read_csv

    rng = np.random.default_rng(3)
    path = tmp_path / "r.csv"
    with open(path, "w", newline="") as f:
        w = csvmod.DictWriter(
            f, fieldnames=["step", "energy_re", "energy_var"])
        w.writeheader()
        for t in range(200):
            e, v = -10.0 + rng.normal(0, 0.01), 0.1 + rng.normal(0, 0.002)
            if t in (150, 180):  # excursions inside the 25% tail
                e, v = -4.0, 3.0
            w.writerow({"step": t + 1, "energy_re": e, "energy_var": v})
    plain = analyze(read_csv(str(path)), robust=False)
    robust = analyze(read_csv(str(path)), robust=True)
    assert robust["tail_excluded"] == 2
    assert abs(robust["energy"] + 10.0) < 0.01
    assert abs(robust["energy_var_mean"] - 0.1) < 0.01
    assert abs(plain["energy"] + 10.0) > 0.1  # the excursions did bite
    assert robust["energy_err"] < plain["energy_err"]


def test_logger_append_resumes_csv(tmp_path):
    """append=True continues an existing CSV (single header, columns from
    the existing file) — a supervisor restart must not discard rows."""
    import csv as csvmod

    path = str(tmp_path / "m.csv")
    lg = MetricsLogger(csv_path=path, print_every=0)
    lg.log(1, {"energy_re": -1.0, "accept": 0.5})
    lg.log(2, {"energy_re": -1.5, "accept": 0.5})
    lg.close()
    lg2 = MetricsLogger(csv_path=path, print_every=0, append=True)
    # extra keys not in the original header are dropped, missing keys blank
    lg2.log(3, {"energy_re": -2.0, "accept": 0.4, "new_key": 9.0})
    lg2.close()
    with open(path, newline="") as f:
        rows = list(csvmod.reader(f))
    assert rows[0][:2] == ["step", "wall_time"]
    assert len(rows) == 4  # one header + 3 data rows
    assert [r[0] for r in rows[1:]] == ["1", "2", "3"]
    assert all(len(r) == len(rows[0]) for r in rows[1:])

    # append=True on a missing file degrades to a fresh write
    path2 = str(tmp_path / "fresh.csv")
    lg3 = MetricsLogger(csv_path=path2, print_every=0, append=True)
    lg3.log(1, {"energy_re": 0.0})
    lg3.close()
    with open(path2, newline="") as f:
        rows2 = list(csvmod.reader(f))
    assert rows2[0][0] == "step" and len(rows2) == 2


def test_read_csv_drops_partial_rows(tmp_path):
    """A killed writer's truncated trailing line (observed: a lone '5' at
    the end of a salvaged hero CSV) must be dropped whole — accepting it
    into only the columns that parse would misalign columns."""
    from qmcnn_tpu.analyze import read_csv

    path = tmp_path / "m.csv"
    path.write_text(
        "step,energy_re,energy_var\n"
        "10,-1.5,0.2\n"
        "20,-1.6,0.1\n"
        "step,energy_re,energy_var\n"   # repeated header (resume-append)
        "30,-1.7,0.05\n"
        "4"                              # truncated buffer tail, no newline
    )
    cols = read_csv(str(path))
    assert list(cols["step"]) == [10.0, 20.0, 30.0]
    assert len(cols["energy_re"]) == len(cols["step"]) == len(cols["energy_var"])
