package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic IVF (inverted-file) codebook: fixed-iteration Lloyd
  * (k-means) over integer-quantized embedding vectors.
  *
  * Everything is exact-integer until a single final division, so training
  * is bit-reproducible across engines (the DuckDB oracle replays the same
  * iterations):
  *
  *  - components quantize to `round(x * 10000)` BIGINT (the repo-wide
  *    vector discipline);
  *  - a centroid is the componentwise integer SUM of its members — cosine
  *    against a sum equals cosine against the mean (the member count
  *    scales dot and norm alike), so no division/rounding enters the loop;
  *  - assignment is argmax of `dot / (sqrt(n2) * sqrt(cn2))` with exact
  *    integer dot/norms and a cent_id tiebreak;
  *  - a list that loses all members keeps its previous centroid;
  *  - the seed is the `k` lowest-id vectors.
  *
  * Scale shape: one Lloyd iteration touches the corpus exactly once
  * (assignment join keyed on `dim`, k·dims centroid rows broadcast-small),
  * and the trained codebook is collected to a k·dims-row local DataFrame —
  * the codebook broadcast step every production IVF performs. Training
  * cost is O(n·d·k·iters); the codebook quality is what makes
  * nprobe/lists the real search-cost dial (balanced lists ⇒ predictable
  * probe fan-out).
  */
object IvfCodebook {

  /** Integer-quantized components: (vec_id, dim 1-based, qx). */
  def comps(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim0", "x")))
      .select(col("vec_id"), (col("dim0") + 1).as("dim"),
        expr("CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)").as("qx"))

  /** Exact per-vector squared norms: (vec_id, n2). */
  def norms(comps: DataFrame): DataFrame =
    comps.groupBy("vec_id").agg(sum(col("qx") * col("qx")).as("n2"))

  /** Seed codebook: the k lowest-id vectors, componentwise
    * (cent_id, dim, cs).
    */
  def seed(comps: DataFrame, k: Int): DataFrame =
    comps.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("dim"), col("qx").as("cs"))

  /** (vec_id, cent_id, sim): exact integer dot and norms, one double
    * division — identical operand order in any engine.
    */
  def similarities(comps: DataFrame, norms: DataFrame,
      cents: DataFrame): DataFrame = {
    val cn = cents.groupBy("cent_id").agg(sum(col("cs") * col("cs")).as("cn2"))
    comps.join(cents, "dim")
      .groupBy("vec_id", "cent_id")
      .agg(sum(col("qx") * col("cs")).as("dot"))
      .join(norms, "vec_id")
      .join(broadcast(cn), "cent_id")
      .select(col("vec_id"), col("cent_id"),
        (col("dot").cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("sim"))
  }

  /** Nearest-list assignment: (vec_id, list_id), deterministic tiebreak on
    * cent_id.
    */
  def assign(comps: DataFrame, norms: DataFrame,
      cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("cent_id"))
    similarities(comps, norms, cents)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cent_id").as("list_id"))
  }

  /** One Lloyd update: assign every vector, then componentwise integer sum
    * per list; lists with no members keep their previous centroid.
    */
  def step(comps: DataFrame, norms: DataFrame,
      cents: DataFrame): DataFrame = {
    val sums = comps.join(assign(comps, norms, cents), "vec_id")
      .groupBy("list_id", "dim")
      .agg(sum(col("qx")).as("cs_new"))
      .withColumnRenamed("list_id", "cent_id")
    cents.join(sums, Seq("cent_id", "dim"), "left")
      .select(col("cent_id"), col("dim"),
        coalesce(col("cs_new"), col("cs")).as("cs"))
  }

  /** Train the codebook: seed with the k lowest-id vectors, run `iters`
    * Lloyd updates, and return the result as a small LOCAL DataFrame
    * (k·dims rows, collected — the codebook broadcast every IVF search
    * performs), so downstream plans reuse the trained codebook without
    * re-running the training subtree.
    */
  /** Train the codebook on a deterministic SAMPLE (`vec_id % sampleEvery
    * == 0`) — the 100 TB discipline: Lloyd is iterative, so training cost
    * is iters × corpus unless the corpus is sampled; codebook quality
    * needs only a representative sample, and assignment of the FULL
    * corpus against the trained codebook stays a single pass. The seed is
    * the k lowest-id vectors of the full corpus (deterministic whether or
    * not they fall in the sample).
    *
    * `seedDf` overrides the default `vec_id < k` seed — that filter means
    * "the k lowest ids" only when ids are dense from 0, which holds for
    * the generated fixtures but not for an admitted SUBSET of a corpus
    * (rejections punch holes) or a micro-batch (ids are a residue class).
    * Callers on such frames pass an explicit (cent_id, dim, cs) seed;
    * cent_ids need only be distinct, not 0..k-1.
    */
  def train(spark: SparkSession, embeddings: DataFrame, k: Int,
      iters: Int, sampleEvery: Int = 1,
      seedDf: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val all = comps(embeddings)
    val c = (if (sampleEvery <= 1) all
      else all.filter(col("vec_id") % sampleEvery === 0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = norms(c).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // each iteration materializes its k·dims centroid table locally
      // (bounded, the codebook) so iteration t+1 starts from a shallow
      // plan instead of re-running every earlier round's joins/windows
      var cents = localize(spark, seedDf.getOrElse(seed(all, k)))
      for (_ <- 1 to iters) cents = localize(spark, step(c, n, cents))
      cents
    } finally { c.unpersist(); n.unpersist() }
  }

  /** Collect a (cent_id, dim, cs) codebook to a small local DataFrame —
    * k·dims rows, the broadcast-side shape every IVF search uses.
    */
  private def localize(spark: SparkSession, cents: DataFrame): DataFrame = {
    import spark.implicits._
    cents.select(col("cent_id"), col("dim").cast("int"), col("cs"))
      .as[(Long, Int, Long)].collect().toSeq
      .toDF("cent_id", "dim", "cs")
  }

  /** Train an INDEPENDENT codebook per `grp` value in one Lloyd pipeline.
    *
    * Product quantization needs one codebook per subspace; running
    * [[train]] per subspace costs subspaces × (iters + 1) scan+shuffle
    * pipelines, each with full job overhead. Because every Lloyd
    * operation here is keyed, adding `grp` to each key trains all
    * subspaces in the SAME jobs: one corpus pass per iteration total —
    * the shape that matters when the corpus is 100 TB and the subspace
    * count is 8 or 16, not 4.
    *
    * `gcomps` is (grp, vec_id, dim, qx) — [[comps]] with a group column;
    * the result (grp, cent_id, dim, cs) is bit-identical per group to
    * running [[train]] on that group's components alone (the groups never
    * interact: joins, argmax windows and member sums all carry `grp`), so
    * a per-subspace oracle replay keeps matching.
    */
  def trainGrouped(spark: SparkSession, gcomps: DataFrame, k: Int,
      iters: Int, sampleEvery: Int = 1,
      seed: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val c = (if (sampleEvery <= 1) gcomps
      else gcomps.filter(col("vec_id") % sampleEvery === 0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = c.groupBy("grp", "vec_id")
      .agg(sum(col("qx") * col("qx")).as("n2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // default seed (PQ's shape, every group holds every vec_id): the k
      // lowest GLOBAL vec_ids per group. Callers whose groups PARTITION
      // the vectors (the two-level coarse tree) pass an explicit
      // per-group seed instead — the global filter would leave most
      // groups seedless there.
      var cents = localizeGrouped(spark, seed.getOrElse(
        gcomps.filter(col("vec_id") < k)
          .select(col("grp"), col("vec_id").as("cent_id"), col("dim"),
            col("qx").as("cs"))))
      for (_ <- 1 to iters)
        cents = localizeGrouped(spark, stepGrouped(c, n, cents))
      cents
    } finally { c.unpersist(); n.unpersist() }
  }

  /** Children of a two-level (IMI-style) coarse quantizer: per super-list
    * sub-codebooks of ~`k2` centroids each, trained by the same
    * deterministic grouped Lloyd.
    *
    * This is the construction that breaks the O(n·k) wall measured by the
    * x30 scaling sweep (ann_ivf_topk 11.4x on 3x data once k ∝ n): with
    * k1 ≈ √k super lists and k2 ≈ k/k1 children per super, training
    * touches sample·(k1 + k2) ≈ sample·2√k centroid pairs per iteration
    * and full-corpus assignment costs n·(k1 + k2) — both O(√k) per row
    * where the flat form pays O(k). The price is the standard IMI
    * approximation: a vector is assigned to the best child OF ITS BEST
    * SUPER, which top-level Lloyd makes near-optimal but not provably
    * optimal.
    *
    * Returns (grp, cent_id, dim, cs): `grp` is the parent super list,
    * `cent_id` is globally unique (child seeds are member vec_ids, and
    * the super assignment partitions vectors). Supers with no sample
    * members produce no children — [[assignTwoLevel]] restricts the
    * level-1 argmax to supers that HAVE children, so every vector always
    * lands in a real list.
    */
  def trainChildren(spark: SparkSession, embeddings: DataFrame,
      superCents: DataFrame, k2: Int, iters: Int,
      sampleEvery: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = comps(embeddings)
    val c = if (sampleEvery <= 1) all
      else all.filter(col("vec_id") % sampleEvery === 0)
    val sa = assign(c, norms(c), broadcast(superCents))
    val gc = c.join(sa, "vec_id")
      .select(col("list_id").as("grp"), col("vec_id"), col("dim"),
        col("qx"))
    // per-group seed: the k2 lowest vec_ids WITHIN each super list
    val ranked = sa
      .withColumn("rk", row_number().over(
        Window.partitionBy("list_id").orderBy("vec_id")))
      .filter(col("rk") <= k2)
      .select(col("list_id").as("grp"), col("vec_id"))
    val seed = gc.join(ranked, Seq("grp", "vec_id"))
      .select(col("grp"), col("vec_id").as("cent_id"), col("dim"),
        col("qx").as("cs"))
    trainGrouped(spark, gc, k2, iters, sampleEvery = 1, seed = Some(seed))
  }

  /** Per-super sampled Lloyd REFINEMENT of a trained two-level tree —
    * the dial SCALING.md §5 records beyond [[trainChildren]]. Runs
    * `passes` additional grouped Lloyd rounds over a deterministic
    * sample (typically DENSER than the one training used): the sample
    * re-partitions by the FIXED super centroids, then each pass
    * re-assigns every sampled vector to the best child WITHIN its super
    * and rebuilds child centroids as member sums — children tighten
    * against the full level-1 catchment that base training only saw
    * through its coarser sample. Supers never move, so the descent
    * structure and every consumer contract hold: same (grp, cent_id)
    * key set, globally-unique child ids, empty children keep their
    * previous centroid (the [[stepGrouped]] discipline, same
    * exact-integer arithmetic and tiebreaks — refinement is
    * bit-deterministic like everything else here).
    *
    * `passes = 0` returns `children` UNCHANGED (reference-identical) —
    * the inert setting every current scale resolves to; the caller
    * derives `passes` from corpus size (the approximation error this
    * repairs grows with the super count k1, which grows as √n). Cost
    * per pass is one corpus-sample scan — O(sample·k2) centroid pairs,
    * the same O(√k)-per-row shape as the tree itself.
    */
  def refineChildren(spark: SparkSession, embeddings: DataFrame,
      superCents: DataFrame, children: DataFrame, passes: Int,
      sampleEvery: Int = 1): DataFrame = {
    if (passes <= 0) children
    else {
      import org.apache.spark.storage.StorageLevel
      val all = comps(embeddings)
      val c = (if (sampleEvery <= 1) all
        else all.filter(col("vec_id") % sampleEvery === 0))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        // Refinement catchments must MATCH SERVING: assignTwoLevel
        // restricts its level-1 argmax to child-bearing supers (supOk),
        // so the refinement sample is partitioned the same way — a
        // sampled vector whose best super is childless refines within
        // the super it will actually be served from, instead of being
        // silently dropped by the stepGrouped inner join.
        val supOk = superCents.join(
          children.select(col("grp").as("cent_id")).distinct(),
          Seq("cent_id"), "left_semi")
        val sa = assign(c, norms(c), broadcast(supOk))
        val gc = c.join(sa, "vec_id")
          .select(col("list_id").as("grp"), col("vec_id"), col("dim"),
            col("qx"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val gn = gc.groupBy("grp", "vec_id")
          .agg(sum(col("qx") * col("qx")).as("n2"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          var cents = children
          for (_ <- 1 to passes)
            cents = localizeGrouped(spark, stepGrouped(gc, gn, cents))
          cents
        } finally { gc.unpersist(); gn.unpersist(); () }
      } finally { c.unpersist(); () }
    }
  }

  /** Two-level nearest-list assignment: level-1 argmax over the (child-
    * bearing) super centroids, then argmax over that super's children —
    * O(n·(k1 + k2)) where the flat [[assign]] pays O(n·k). Same exact-
    * integer arithmetic and cent_id tiebreaks as the flat path; output
    * schema identical: (vec_id, list_id) with list_id a child cent_id.
    */
  def assignTwoLevel(comps: DataFrame, norms: DataFrame,
      superCents: DataFrame, children: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val supOk = superCents.join(
      children.select(col("grp").as("cent_id")).distinct(),
      Seq("cent_id"), "left_semi")
    val sa = assign(comps, norms, broadcast(supOk))
      .withColumnRenamed("list_id", "grp")
    val cn = children.groupBy("cent_id")
      .agg(sum(col("cs") * col("cs")).as("cn2"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("cent_id"))
    comps.join(sa, "vec_id")
      .join(broadcast(children), Seq("grp", "dim"))
      .groupBy("vec_id", "cent_id")
      .agg(sum(col("qx") * col("cs")).as("dot"))
      .join(norms, "vec_id")
      .join(broadcast(cn), "cent_id")
      .select(col("vec_id"), col("cent_id"),
        (col("dot").cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cent_id").as("list_id"))
  }

  /** Third quantizer level: per-MID sub-codebooks of ~`k3` centroids each
    * — children of the two-level tree's children, trained by the same
    * deterministic grouped Lloyd. This is the dial past [[trainChildren]]
    * (SCALING.md §5): once list count k grows to where even √k exceeds
    * the flat-Lloyd comfort zone (k1 > FlatKMax at k > 4096 lists,
    * n ≈ 512 k vectors at the 125-vectors/list target), the two-level
    * tree's own super codebook hits the wall the tree was built to
    * avoid. A third level restores the bound: k1 ≈ k2 ≈ k3 ≈ ∛k, so
    * training touches O(sample·3∛k) centroid pairs per iteration and
    * full-corpus assignment costs O(n·3∛k).
    *
    * `mids` is the (grp=super, cent_id=mid, dim, cs) output of
    * [[trainChildren]]; the sample descends the two-level tree
    * ([[assignTwoLevel]] — the exact serving path, so train and serve
    * catchments match by construction), then a grouped Lloyd keyed by
    * mid trains ~k3 children per mid. Returns (grp=mid, cent_id, dim,
    * cs) with globally-unique cent_ids (seeds are member vec_ids and
    * the mid assignment partitions vectors). Mids with no sample
    * members produce no grandchildren — [[assignThreeLevel]] restricts
    * its descent to grandchild-bearing mids, so every vector still
    * lands in a real list.
    */
  def trainGrandChildren(spark: SparkSession, embeddings: DataFrame,
      superCents: DataFrame, mids: DataFrame, k3: Int, iters: Int,
      sampleEvery: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = comps(embeddings)
    val c = if (sampleEvery <= 1) all
      else all.filter(col("vec_id") % sampleEvery === 0)
    val sa = assignTwoLevel(c, norms(c), superCents, mids)
    val gc = c.join(sa, "vec_id")
      .select(col("list_id").as("grp"), col("vec_id"), col("dim"),
        col("qx"))
    // per-group seed: the k3 lowest vec_ids WITHIN each mid list
    val ranked = sa
      .withColumn("rk", row_number().over(
        Window.partitionBy("list_id").orderBy("vec_id")))
      .filter(col("rk") <= k3)
      .select(col("list_id").as("grp"), col("vec_id"))
    val seed = gc.join(ranked, Seq("grp", "vec_id"))
      .select(col("grp"), col("vec_id").as("cent_id"), col("dim"),
        col("qx").as("cs"))
    trainGrouped(spark, gc, k3, iters, sampleEvery = 1, seed = Some(seed))
  }

  /** Three-level nearest-list assignment: the two-level descent
    * ([[assignTwoLevel]], restricted to grandchild-bearing mids) picks a
    * mid, then an argmax over that mid's grandchildren picks the list —
    * O(n·(k1 + k2 + k3)) per corpus pass. Same exact-integer arithmetic
    * and cent_id tiebreaks as every other level; output schema
    * identical: (vec_id, list_id) with list_id a grandchild cent_id.
    */
  def assignThreeLevel(comps: DataFrame, norms: DataFrame,
      superCents: DataFrame, mids: DataFrame,
      grandChildren: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val midOk = mids.join(
      grandChildren.select(col("grp").as("cent_id")).distinct(),
      Seq("cent_id"), "left_semi")
    val sa = assignTwoLevel(comps, norms, superCents, midOk)
      .withColumnRenamed("list_id", "grp")
    val cn = grandChildren.groupBy("cent_id")
      .agg(sum(col("cs") * col("cs")).as("cn2"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("cent_id"))
    comps.join(sa, "vec_id")
      .join(broadcast(grandChildren), Seq("grp", "dim"))
      .groupBy("vec_id", "cent_id")
      .agg(sum(col("qx") * col("cs")).as("dot"))
      .join(norms, "vec_id")
      .join(broadcast(cn), "cent_id")
      .select(col("vec_id"), col("cent_id"),
        (col("dot").cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cent_id").as("list_id"))
  }

  /** One grouped Lloyd update — [[step]] with `grp` carried through every
    * key: per-group assignment argmax, per-group member sums, empty lists
    * keep their previous centroid. */
  private def stepGrouped(gcomps: DataFrame, gnorms: DataFrame,
      cents: DataFrame): DataFrame = {
    val cn = cents.groupBy("grp", "cent_id")
      .agg(sum(col("cs") * col("cs")).as("cn2"))
    val w = Window.partitionBy("grp", "vec_id")
      .orderBy(col("sim").desc, col("cent_id"))
    val assigned = gcomps.join(broadcast(cents), Seq("grp", "dim"))
      .groupBy("grp", "vec_id", "cent_id")
      .agg(sum(col("qx") * col("cs")).as("dot"))
      .join(gnorms, Seq("grp", "vec_id"))
      .join(broadcast(cn), Seq("grp", "cent_id"))
      .select(col("grp"), col("vec_id"), col("cent_id"),
        (col("dot").cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("grp"), col("vec_id"), col("cent_id").as("list_id"))
    val sums = gcomps.join(assigned, Seq("grp", "vec_id"))
      .groupBy("grp", "list_id", "dim")
      .agg(sum(col("qx")).as("cs_new"))
      .withColumnRenamed("list_id", "cent_id")
    cents.join(sums, Seq("grp", "cent_id", "dim"), "left")
      .select(col("grp"), col("cent_id"), col("dim"),
        coalesce(col("cs_new"), col("cs")).as("cs"))
  }

  /** Grouped [[localize]]: groups × k · dims rows, still codebook-small. */
  private def localizeGrouped(spark: SparkSession,
      cents: DataFrame): DataFrame = {
    import spark.implicits._
    cents.select(col("grp"), col("cent_id"), col("dim").cast("int"),
        col("cs"))
      .as[(Long, Long, Int, Long)].collect().toSeq
      .toDF("grp", "cent_id", "dim", "cs")
  }
}
