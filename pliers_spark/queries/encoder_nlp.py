"""Registry module (split from the former queries.py monolith; same
@query/ORACLES contract as every sibling).

Queries: lm_topk, encoder_sentiment, spacy_attrs
"""
from __future__ import annotations

from ._registry import T, _docs, query
from .features_a import _tag_case_sql
from .features_b import _lm_common_ctes



def _lm_vocab_values() -> str:
    """The stand-in LM 'weights' as literal VALUES rows — the same
    md5-derived embeddings encoder._embed builds per worker (repr emits
    shortest round-trip decimals, so both engines parse identical bits)."""
    from pliers_spark.functions.encoder import LM_VOCAB, _embed

    rows = ", ".join(
        "('" + w + "', " + ", ".join(repr(x) for x in _embed(w)) + ")" for w in sorted(LM_VOCAB)
    )
    return f"vocab(word, e0, e1, e2, e3) AS (VALUES {rows})"



_LM_TOP_K = 5



def _lm_topk_sql() -> str:
    dot = " + ".join(f"c{d} * e{d}" for d in range(4))
    return f"""WITH {_lm_common_ctes()},
       {_lm_vocab_values()},
       logits AS (SELECT doc_id, word, {dot} AS l FROM ctx CROSS JOIN vocab),
       mx AS (SELECT doc_id, max(l) AS m FROM logits GROUP BY doc_id),
       expd AS (SELECT l.doc_id, l.word, exp(l.l - m.m) AS ev
                FROM logits l JOIN mx m USING (doc_id)),
       den AS (SELECT doc_id,
                      list_reduce(list_prepend(0.0, list(ev ORDER BY word)),
                                  (a, b) -> a + b) AS s
               FROM expd GROUP BY doc_id),
       probs AS (SELECT e.doc_id, e.word, e.ev / d.s AS p
                 FROM expd e JOIN den d USING (doc_id)),
       ranked AS (SELECT doc_id, word, p,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY p DESC, word) AS rank
                  FROM probs)
       SELECT doc_id, rank::BIGINT AS rank, word AS token, round_even(p, 6) AS prob
       FROM ranked WHERE rank <= {_LM_TOP_K}"""



@query("lm_topk", _lm_topk_sql())
def q_lm_topk(spark, sf_dir):
    """BertLMExtractor masked-LM top-k candidate selection (reference
    pliers/extractors/text.py:740-749) on the md5-derived stand-in
    weights: per doc, softmax over the candidate vocabulary of
    context·candidate logits, top-5 by probability. Iterator pandas UDF
    (weights built once per worker), bit-deterministic vs the oracle
    (libm exp + fixed-order folds)."""
    from pliers_spark.functions.encoder import masked_lm_scores

    return masked_lm_scores(
        _docs(spark, sf_dir), "text", "doc_id", top_k=_LM_TOP_K
    )



def _encoder_sentiment_sql() -> str:
    from pliers_spark.functions.encoder import SENT_CLASSES, _embed

    dot = lambda cls: " + ".join(
        f"c{d} * {repr(_embed('class:' + cls)[d])}" for d in range(4)
    )
    logits = ", ".join(f"({dot(c)}) AS l_{c}" for c in SENT_CLASSES)
    mx = "greatest(" + ", ".join(f"l_{c}" for c in SENT_CLASSES) + ")"
    # sequential sum in sorted class order (neg, neu, pos) = Python fold
    den = " + ".join(f"e_{c}" for c in sorted(SENT_CLASSES))
    exps = ", ".join(f"exp(l_{c} - {mx}) AS e_{c}" for c in SENT_CLASSES)
    return f"""WITH {_lm_common_ctes()},
       logits AS (SELECT doc_id, {logits} FROM ctx),
       expd AS (SELECT doc_id, {exps} FROM logits)
       SELECT doc_id,
              round_even(e_neg / ({den}), 6) AS sent_neg,
              round_even(e_neu / ({den}), 6) AS sent_neu,
              round_even(e_pos / ({den}), 6) AS sent_pos
       FROM expd"""



@query("encoder_sentiment", _encoder_sentiment_sql())
def q_encoder_sentiment(spark, sf_dir):
    """BertSentimentExtractor surface (pliers/extractors/text.py:767-831):
    softmax over class logits against the document context, emitted as
    per-class probabilities — vector ops inside the iterator-batched
    encoder UDF on the deterministic stand-in weights."""
    from pliers_spark.functions.encoder import sentiment_softmax

    return sentiment_softmax(_docs(spark, sf_dir), "text", "doc_id")



def _spacy_attrs_sql() -> str:
    from pliers_spark.functions.pos import TAG_TO_UNIVERSAL
    from pliers_spark.functions.stemming import TAG_TO_WORDNET, morphy_sql

    wn_case = "CASE " + " ".join(
        f"WHEN tag = '{t}' THEN '{p}'" for t, p in TAG_TO_WORDNET.items()
    ) + " ELSE 'n' END"
    upos_case = "CASE " + " ".join(
        f"WHEN tag = '{t}' THEN '{p}'" for t, p in TAG_TO_UNIVERSAL.items()
    ) + " ELSE 'NOUN' END"
    sw = ", ".join(f"'{w}'" for w in T.ENGLISH_STOPWORDS)
    upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    lower = "abcdefghijklmnopqrstuvwxyz"
    shape = f"translate(token, '{upper}{lower}0123456789', '{'X'*26}{'x'*26}{'d'*10}')"
    for c in "Xxd":
        shape = f"regexp_replace({shape}, '{c}{{5,}}', '{c*4}', 'g')"
    return f"""WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
                unnest(string_split(trim(text), ' ')) AS token
         FROM documents),
       ctx AS (
         SELECT doc_id, pos, token, lower(token) AS w,
                lower(lag(token) OVER (PARTITION BY doc_id ORDER BY pos)) AS prev_w
         FROM toks),
       tagged AS (SELECT doc_id, pos, token, w, {_tag_case_sql()} AS tag FROM ctx),
       d AS (SELECT *, {wn_case} AS wnp,
                    min(CASE WHEN tag IN ('VB','VBG','VBD') THEN pos END)
                      OVER (PARTITION BY doc_id) AS fv
             FROM tagged)
       SELECT doc_id, pos, token,
              {morphy_sql('w', 'wnp')} AS lemma,
              tag,
              {upos_case} AS upos,
              CASE WHEN pos = fv THEN 'ROOT' ELSE 'dep' END AS dep,
              list_contains([{sw}], w) AS is_stop,
              regexp_full_match(token, '[A-Za-z]+') AS is_alpha,
              regexp_full_match(replace(replace(w, '.', ''), ',', ''), '[0-9]+') AS like_num,
              {shape} AS shape
       FROM d"""



@query("spacy_attrs", _spacy_attrs_sql())
def q_spacy_attrs(spark, sf_dir):
    """SpaCyExtractor-equivalent per-token linguistic attributes
    (pliers/extractors/text.py:339-409, features='token'): token, lemma,
    tag, universal pos, dep proxy (first verb = ROOT; documented
    heuristic), is_stop, is_alpha, like_num, spaCy-style shape. One
    window pass per doc, all-Column expressions."""
    from pliers_spark.functions.pos import token_attributes

    return token_attributes(_docs(spark, sf_dir))



# --------------------------------------------------------------------------
# batch 8 (round 2): named librosa-style audio features over STFT frames
# (VERDICT item 6) + non-numeric merge clash aggfunc 'first' (item 9)


def _shape_sql() -> str:
    from pliers_spark.functions.audio_features import spectral_shape_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return spectral_shape_sql(stft_power_sql())
