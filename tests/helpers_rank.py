"""Importable deterministic raters/pickers for YAML pipeline tests
(the runner resolves dotted paths via plans.pipeline._load_callable)."""


def nchars_rater(batch, ctx):
    return [1 + int(n) % 7 for n in batch["n_chars"]]
