"""Regenerate the README zoo tables from benchmarks/*.json.

Prints the markdown; paste (or pipe) into README.md. Keeps table refreshes
mechanical so the docs can't drift from the recorded measurements.

Run: ``python -m tools.readme_tables``
"""
import json
import os

BENCH_DIR = os.path.join(os.path.dirname(__file__), "..", "benchmarks")


def _rows(path):
    with open(path) as f:
        d = json.load(f)
    return sorted(d["rows"], key=lambda r: -r["img_per_s"])


def three_col(rows, cell):
    n = (len(rows) + 2) // 3
    cols = [rows[i * n:(i + 1) * n] for i in range(3)]
    out = ["| model | img/s | model | img/s | model | img/s |",
           "|---|---|---|---|---|---|"]
    for i in range(n):
        cells = []
        for c in cols:
            cells += cell(c[i]) if i < len(c) else ["", ""]
        out.append("| " + " | ".join(cells) + " |")
    return "\n".join(out)


def main():
    inf = _rows(os.path.join(BENCH_DIR, "zoo_bench_2048x1024_bf16.json"))
    print("### Inference (2048x1024 bf16, best batch)\n")
    print(three_col(inf, lambda r: [r["model"], f"{r['img_per_s']:.1f}"]))
    tr_path = os.path.join(BENCH_DIR, "zoo_train_2048x1024_bf16.json")
    if os.path.exists(tr_path):
        tr = _rows(tr_path)
        print("\n### Training (full step, 2048x1024 bf16, best batch)\n")
        print(three_col(
            tr, lambda r: [r["model"],
                           f"{r['img_per_s']:.1f} (b{r['batch']})"]))


if __name__ == "__main__":
    main()
