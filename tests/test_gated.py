"""Environment-gated gates, kept warm (VERDICT r3 item 9).

Every test here names the exact resource it is blocked on and runs for real
the moment that resource exists -- `pytest -m gated` collects them.  They are
the first lines a real user executes (real-data PPL parity, the real
`lm_eval` package, HF hub dataset branches); inside this container they skip,
never xfail, so a green run cannot be mistaken for the real gate passing.
"""

import os
import socket

import pytest

pytestmark = pytest.mark.gated


def _has_network(host="huggingface.co", port=443, timeout=2.0) -> bool:
    try:
        socket.create_connection((host, port), timeout=timeout).close()
        return True
    except OSError:
        return False


def _lm_eval_available() -> bool:
    # checked at RUN time on the exact symbols the adapter uses: other test
    # modules stub partial lm_eval trees into sys.modules, and a bare
    # `import lm_eval` probe can see a phantom module mid-suite
    try:
        import lm_eval.api.instance  # noqa: F401
        from lm_eval.api.model import LM  # noqa: F401

        return getattr(lm_eval, "__file__", None) is not None
    except Exception:
        return False


def test_lm_eval_adapter_against_real_package():
    """Smoke the adapter against the REAL lm-eval-harness (reference glue:
    main.py:427-466): wrap a tiny engine LM and run one loglikelihood call
    through lm_eval's API surface."""
    if not _lm_eval_available():
        pytest.skip("the real `lm_eval` package is not installed in this "
                    "container (pip install lm-eval)")
    import jax
    import lm_eval

    from iron_weight_only_quant_tpu.evals.lm import EvalLM
    from iron_weight_only_quant_tpu.evals.lm_eval_adapter import (
        make_lm_eval_model,
    )
    from iron_weight_only_quant_tpu.models import (
        LlamaConfig,
        llama_forward,
        llama_init,
    )

    cfg = LlamaConfig.tiny()
    params = llama_init(cfg, jax.random.PRNGKey(0))
    evallm = EvalLM(params, llama_forward, cfg, batch_size=2)
    # toy whitespace tokenizer keeps this self-contained (the adapter only
    # needs encode/decode callables)
    encode = lambda s: [ord(c) % cfg.vocab_size for c in s]  # noqa: E731
    decode = lambda ids: "".join(chr(97 + (i % 26)) for i in ids)  # noqa: E731
    lm = make_lm_eval_model(evallm, encode, decode)
    Instance = lm_eval.api.instance.Instance
    inst = Instance(request_type="loglikelihood",
                    doc={}, arguments=("a b", " c"), idx=0)
    out = lm.loglikelihood([inst])
    assert len(out) == 1 and isinstance(out[0][0], float)


@pytest.mark.skipif(not _has_network(),
                    reason="no network egress to huggingface.co in this "
                           "container")
def test_loaders_hub_branch_wikitext2():
    """The HF-hub fallback branch of the wikitext2 loader (reference
    gptq/datautils.py:39-62) -- local-first is covered offline in
    test_loaders_local.py; this exercises the actual hub download."""
    from iron_weight_only_quant_tpu.data.loaders import get_loaders

    train, test = get_loaders("wikitext2", nsamples=2, seed=0, seqlen=128,
                              model="gpt2")
    assert len(train) == 2


@pytest.mark.skipif(not _has_network(),
                    reason="no network egress (HF checkpoint + datasets "
                           "needed); run scripts/run_real_parity.sh on a "
                           "connected host")
def test_real_parity_script_exists_and_is_wired():
    """The one-command real-data PPL parity gate (LLaMA-7B W4 g128 wikitext
    within 0.05 of gptq/README.md:27-32).  Network alone is not enough to
    run the full 7B pipeline in CI time, so this checks the script is
    present and executable; the script itself is dry-run tested offline."""
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "run_real_parity.sh")
    assert os.path.exists(path)
    assert os.access(path, os.X_OK)
