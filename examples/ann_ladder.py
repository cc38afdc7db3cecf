"""The embedding-retrieval ladder: build each index tier once, search
the same query through all of them, and report recall against the
exact answer — the "which index do I deploy at my scale" walkthrough.

    embeddings (array<float>)
      │ exact       cosine_topk            floats, full scan — the truth
      │ IVF         ivf_train → ivf_topk   probe n of m cells, exact cosines
      │ PQ          pq_train → pq_encode → pq_topk(codes=…)
      │                                    8-byte codes, ADC + exact refine
      │ IVFPQ       pq_encode(ivf_codebook=…) → ivfpq_topk(codes=…)
      │                                    coarse-prune + ADC, the FAISS shape
      │ BQ          bq_encode → bq_topk(bits=…)
      ▼                                    1 BIGINT/vector, integer-only scan

Run:  python examples/ann_ladder.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints per-tier recall@10 and
index width). Search always goes through the PERSISTED index
DataFrames — the embeddings are touched only by the exact tier and
the refine steps, exactly like a deployment would.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


QUERY, K, RERANK = 0, 10, 100


def run(spark, sf_dir: str) -> dict[str, float]:
    """Build every tier, search QUERY through each, return recall@10
    vs the exact answer (the smoke test pins floors)."""
    from zestdb_spark.functions import similarity as S

    embs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .cache()
    )
    truth = {r["vec_id"] for r in S.cosine_topk(embs, QUERY, K).collect()}

    icb = S.ivf_train(embs, 16, iters=2)                    # fps k-means
    pcb = S.pq_train(embs, m=8, n_codes=16, init="fps", iters=8)
    pq_index = S.pq_encode(embs, pcb).cache()
    ivfpq_index = S.pq_encode(embs, pcb, ivf_codebook=icb).cache()
    bq_index = S.bq_encode(embs).cache()

    def recall(df) -> float:
        got = {r["vec_id"] for r in df.collect()}
        return len(got & truth) / K

    out = {
        "exact": 1.0,
        "ivf_probe8": recall(S.ivf_topk(embs, QUERY, K, 16, 8, codebook=icb)),
        "pq_refine": recall(
            S.pq_topk(embs, QUERY, K, codebook=pcb, codes=pq_index, rerank=RERANK)
        ),
        "ivfpq_refine": recall(
            S.ivfpq_topk(
                embs, QUERY, K, 16, 8, icb, pcb, codes=ivfpq_index, rerank=RERANK
            )
        ),
        "bq_refine": recall(
            S.bq_topk(embs, QUERY, K, bits=bq_index, rerank=RERANK)
        ),
    }
    # the BATCH faces of the ladder (round 10): every query row at
    # once — knn_join over the float assignment, knn_join_pq over the
    # 8-byte compressed index. Single-query recall carries over (the
    # batch plans are pinned equal per query by test); here we check
    # the QUERY row's answer survives the batch plan.
    queries = embs.filter(f"vec_id < {max(QUERY + 1, 5)}")
    batch = S.knn_join(embs, queries, k=K, n_centroids=16, n_probe=8, codebook=icb)
    out["knn_join_probe8"] = recall(batch.filter(f"qid = {QUERY}"))
    batch_pq = S.knn_join_pq(
        ivfpq_index, queries, pcb, icb, k=K, n_probe=8, rerank=RERANK, embs=embs
    )
    out["knn_join_pq_refine"] = recall(batch_pq.filter(f"qid = {QUERY}"))
    return out


def main() -> None:
    from zestdb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ann_ladder")
    for tier, r in run(spark, sf_dir).items():
        print(f"{tier:>14}: recall@10 = {r:.2f}")


if __name__ == "__main__":
    main()
