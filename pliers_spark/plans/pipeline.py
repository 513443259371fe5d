"""Declarative pipeline spec — the Graph API recast for DataFrames.

Parity target: pliers ``Graph`` (``pliers/graph.py:71-314``) — a JSON
spec ``{'roots': [{'transformer': name, 'parameters': {...},
'children': [...]}]}`` naming transformers by string via a registry
(``pliers/transformers/base.py:286-317`` ``get_transformer``). We keep
the spec shape verbatim for familiarity but execution becomes lazy
DataFrame construction:

- each node is a **stage**: ``DataFrame -> DataFrame``;
- children consume their parent's output frame; fan-out (>1 child)
  triggers ``.persist()`` on the shared parent frame — the direct
  analog of the reference's generator materialization at fan-out
  (``pliers/graph.py:228-232``);
- leaf outputs are merged with ``operators.results.merge_features``
  (≡ ``merge_results``), or returned as a dict when ``merge=False``;
- implicit conversion (the reference's type-directed converter
  insertion, ``pliers/transformers/base.py:136-155``): a stage that
  declares ``input_level='token'`` applied to a document-level frame
  gets a tokenize/explode stage inserted automatically, per the
  registry's converter map — plan-construction-time rewriting, not a
  runtime dispatch.

Registration is case-insensitive by stage name like ``get_transformer``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import results as R

_REGISTRY: dict[str, "StageDef"] = {}


@dataclass
class StageDef:
    name: str
    build: Callable[..., Callable[[DataFrame], DataFrame]]
    input_level: str = "document"  # 'document' | 'token'
    is_leaf_feature: bool = True


def register_stage(name: str, input_level: str = "document", is_leaf_feature: bool = True):
    def deco(build):
        _REGISTRY[name.lower()] = StageDef(name.lower(), build, input_level, is_leaf_feature)
        return build

    return deco


def get_stage(name: str) -> StageDef:
    try:
        return _REGISTRY[name.lower()]
    except KeyError:
        raise KeyError(f"unknown stage '{name}'; registered: {sorted(_REGISTRY)}") from None


# --- built-in stages --------------------------------------------------------


@register_stage("lowercase", is_leaf_feature=False)
def _lowercase(column: str = "text"):
    return lambda df: df.withColumn(column, T.lower_case(F.col(column)))


@register_stage("remove_punctuation", is_leaf_feature=False)
def _remove_punct(column: str = "text"):
    return lambda df: df.withColumn(column, T.remove_punctuation(F.col(column)))


@register_stage("remove_stopwords", is_leaf_feature=False)
def _remove_stopwords(column: str = "text", stopwords: list[str] | None = None):
    sw = stopwords or T.ENGLISH_STOPWORDS
    return lambda df: df.withColumn(column, T.remove_tokens(F.col(column), sw))


@register_stage("tokenize", is_leaf_feature=False)
def _tokenize(column: str = "text"):
    def stage(df):
        return df.select(
            *[c for c in df.columns if c != column],
            F.posexplode(T.tokenize(F.col(column))).alias("token_pos", "token"),
        )

    return stage


@register_stage("length")
def _length(column: str = "text"):
    return lambda df: df.withColumn("text_length", T.text_length(F.col(column)))


@register_stage("num_unique_words")
def _nuw(column: str = "text"):
    return lambda df: df.withColumn("n_unique", T.num_unique_words(F.col(column)))


@register_stage("token_count")
def _tc(column: str = "text"):
    return lambda df: df.withColumn("n_tokens", T.token_count(F.col(column)))


@register_stage("quality")
def _quality(column: str = "text"):
    return lambda df: df.withColumn("quality", T.quality_score(F.col(column)))


@register_stage("langid")
def _langid(column: str = "text"):
    return lambda df: df.withColumn("lang_pred", T.langid_best(F.col(column)))


@register_stage("sentiment")
def _sentiment(column: str = "text"):
    from ..functions.vader import with_vader

    return lambda df: with_vader(df, text_col=column)


@register_stage("stem", input_level="token", is_leaf_feature=False)
def _stem(stemmer: str = "porter"):
    from ..functions.snowball import snowball_stem_col as snowball_stem
    from ..functions.stemming import porter_stem_col as porter_stem

    fns = {"porter": porter_stem, "snowball": snowball_stem}
    try:
        fn = fns[stemmer]
    except KeyError:
        raise ValueError(f"unknown stemmer {stemmer!r}; choose from {sorted(fns)}") from None
    return lambda df: df.withColumn("token", fn(F.col("token")))


@register_stage("word_counter", input_level="token")
def _word_counter(case_sensitive: bool = False):
    from ..operators.temporal import running_count

    def stage(df):
        d = df if case_sensitive else df.withColumn("token", F.lower(F.col("token")))
        key = [c for c in ("doc_id", "url") if c in d.columns]
        return running_count(d, key, "token", "token_pos", out_col="word_count")

    return stage


# --- spec execution ---------------------------------------------------------


@dataclass
class Node:
    transformer: str
    parameters: dict = field(default_factory=dict)
    children: list["Node"] = field(default_factory=list)

    @classmethod
    def from_spec(cls, spec: dict) -> "Node":
        return cls(
            transformer=spec["transformer"],
            parameters=spec.get("parameters", {}),
            children=[cls.from_spec(c) for c in spec.get("children", [])],
        )


class Pipeline:
    """Executable DAG of stages (≡ pliers Graph)."""

    def __init__(self, spec: dict | str):
        if isinstance(spec, str):
            spec = json.loads(spec)
        self.roots = [Node.from_spec(r) for r in spec["roots"]]
        # TransformationLog analog (pliers/stimuli/base.py:181-238): one
        # record per executed stage, parent-linked, implicit conversions
        # flagged. Plan-construction provenance — no per-row cost.
        self.history: list[dict] = []

    def run(self, df: DataFrame, key_cols: list[str], merge: bool = True):
        self.history = []
        leaves: list[DataFrame] = []
        for root in self.roots:
            self._run_node(root, df, is_doc_level=True, leaves=leaves, parent=None)
        if not merge:
            return leaves
        return R.merge_features(leaves, key_cols) if len(leaves) > 1 else leaves[0]

    def _log(self, transformer: str, parameters: dict, parent: int | None,
             implicit: bool) -> int:
        step = len(self.history)
        self.history.append(
            {
                "step": step,
                "transformer": transformer.lower(),
                "parameters": json.dumps(parameters, sort_keys=True),
                "parent_step": parent,
                "implicit": implicit,
            }
        )
        return step

    def history_df(self, spark) -> DataFrame:
        """``history.to_df()`` parity (pliers/stimuli/base.py:231-238):
        unroll the last run's parent-linked stage chain into a DataFrame
        (step, transformer, parameters, parent_step, implicit)."""
        return spark.createDataFrame(
            self.history,
            "step long, transformer string, parameters string, "
            "parent_step long, implicit boolean",
        )

    def _run_node(self, node: Node, df: DataFrame, is_doc_level: bool,
                  leaves: list[DataFrame], parent: int | None):
        stage_def = get_stage(node.transformer)
        if stage_def.input_level == "token" and is_doc_level:
            # implicit conversion: insert tokenize (type-directed rewrite,
            # ≡ pliers get_converter insertion, transformers/base.py:136-155)
            df = get_stage("tokenize").build()(df)
            parent = self._log("tokenize", {}, parent, implicit=True)
            is_doc_level = False
        out = stage_def.build(**node.parameters)(df)
        parent = self._log(node.transformer, node.parameters, parent, implicit=False)
        if node.transformer.lower() == "tokenize":
            is_doc_level = False
        if len(node.children) > 1:
            out = out.persist()  # fan-out reuse (≡ graph.py:228-232 caching)
        if not node.children:
            leaves.append(out)
        for child in node.children:
            self._run_node(child, out, is_doc_level, leaves, parent)

    def to_json(self) -> str:
        def node_spec(n: Node) -> dict:
            d = {"transformer": n.transformer}
            if n.parameters:
                d["parameters"] = n.parameters
            if n.children:
                d["children"] = [node_spec(c) for c in n.children]
            return d

        return json.dumps({"roots": [node_spec(r) for r in self.roots]})
