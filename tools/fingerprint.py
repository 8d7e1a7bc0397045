"""Graph fingerprints for benchmark rows (VERDICT r4 weak #2).

r4 lost batch levels on cgnet/dabnet/esnet to a tightened remote-compile
ceiling and the claim "graphs unchanged, environment-side" rested on
memory. Every bench row now records a fingerprint of the UNOPTIMIZED
lowered module (jax .lower().as_text() — stable graph identity, no TPU
compile involved), so next time a batch level disappears,
ceiling-regression vs graph-regression is a diff away:

    same fingerprint, lower batch  -> environment-side ceiling change
    new fingerprint                -> the repo changed the graph
"""
import hashlib


def graph_fingerprint(lowered) -> dict:
    """{'hash': 16-hex, 'lines': N} for a jax.stages.Lowered."""
    txt = lowered.as_text()
    return {"hash": hashlib.sha256(txt.encode()).hexdigest()[:16],
            "lines": txt.count("\n")}
