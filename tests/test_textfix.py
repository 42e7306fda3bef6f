"""Mojibake repair (extras/textfix.py): unit vectors for the classic
single- and double-encoding bugs, safety on genuine accented text,
idempotence, and the distributed ground-truth recovery gate."""

import unicodedata

from kazu_ray.extras.textfix import _corrupt_once, fix_text, inject

SF = "/root/testdata/sf0.001"


def test_single_mojibake_repaired():
    truth = "café olé — naïve résumé"
    corrupted = _corrupt_once(truth)
    assert corrupted != truth and "Ã" in corrupted
    fixed, rounds = fix_text(corrupted)
    assert fixed == unicodedata.normalize("NFKC", truth)
    assert rounds == 1


def test_double_mojibake_repaired():
    truth = "señor año jalapeño"
    corrupted = _corrupt_once(_corrupt_once(truth))
    fixed, rounds = fix_text(corrupted)
    assert fixed == unicodedata.normalize("NFKC", truth)
    assert rounds == 2


def test_genuine_accents_untouched():
    # real accented text must NOT be "repaired": its Latin-1 bytes are
    # not valid UTF-8, so the round-trip detector rejects it
    for s in ["café", "Müller señor", "déjà vu ünïcode"]:
        fixed, rounds = fix_text(s)
        assert fixed == unicodedata.normalize("NFKC", s)
        assert rounds == 0


def test_ascii_fast_path_and_idempotence():
    s = "plain ascii text 123"
    fixed, rounds = fix_text(s)
    assert fixed == s and rounds == 0
    # idempotence on repaired mojibake
    corrupted = _corrupt_once("über café")
    once, _ = fix_text(corrupted)
    twice, r2 = fix_text(once)
    assert twice == once and r2 == 0


def test_nfkc_applied():
    # fullwidth + ligature forms collapse under NFKC
    fixed, _ = fix_text("ﬁle　ＡＢＣ")
    assert fixed == "file ABC"


def test_inject_is_deterministic_and_keyed():
    t = "a document about genes"
    assert inject(1, t) == (t, t, 0)  # doc_id % 3 != 0
    truth3, corr3, r3 = inject(3, t)  # accents only
    assert r3 == 0 and truth3 == corr3 and "á" in truth3
    truth6, corr6, r6 = inject(6, t)
    assert r6 == 1 and corr6 == _corrupt_once(truth6)
    truth12, corr12, r12 = inject(12, t)
    assert r12 == 2 and corr12 == _corrupt_once(_corrupt_once(truth12))


def test_distributed_recovery_gate(ray_session):
    from kazu_ray.extras.metrics import q_textfix_gate

    m = q_textfix_gate(SF).iloc[0]
    assert bool(m["passes"]), m.to_dict()
    assert m["recovered_frac"] == 1.0 and m["n_docs"] == 500


def test_inject_vowel_free_text_counts_zero_rounds():
    # regression: the mis-decode is a no-op on text whose accent pass
    # leaves it ASCII; rounds_injected must be 0, not 1/2
    for did in (6, 12):
        truth, corrupted, rounds = inject(did, "123 !! xyz")
        assert rounds == 0 and corrupted == truth
