package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal, Not, Round}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, FloatType, IntegerType}

import graft.expressions.CosineSimilarity

/** Shared helpers for the transparent-index rewrite rules (IvfTopKRewrite,
  * HnswTopKRewrite): ONE path canonicalization (registry keys and
  * maintenance-side invalidation must agree on `file:` prefixes and
  * trailing slashes) and ONE literal-query-vector extractor — the pieces
  * both rules must never let drift.
  */
private[plans] object RewriteSupport {

  def canon(path: String): String =
    path.stripPrefix("file:").replaceAll("/+$", "")

  /** The literal query vector behind an ORDER BY cosine_sim(col, <lit>),
    * as doubles (either float or double array literals).
    */
  def literalVec(l: Literal): Option[Array[Double]] = (l.value, l.dataType) match {
    case (v: ArrayData, ArrayType(FloatType, _))  => Some(v.toFloatArray().map(_.toDouble))
    case (v: ArrayData, ArrayType(DoubleType, _)) => Some(v.toDoubleArray())
    case _ => None
  }

  /** Top-level AND-conjuncts of a condition — the granularity at which a
    * threshold predicate may be served (inside an OR/NOT a failing sim no
    * longer implies a failing row).
    */
  def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** The threshold literal as a double — the comparison side Spark typed
    * for the user (plain `0.2` is a double in DataFrame code, a decimal
    * in SQL).
    */
  def thresholdOf(l: Literal): Option[Double] = (l.value, l.dataType) match {
    case (v: java.lang.Double, DoubleType) => Some(v.doubleValue)
    case (v: java.lang.Float, FloatType) => Some(v.doubleValue)
    case (v: org.apache.spark.sql.types.Decimal, _: DecimalType) => Some(v.toDouble)
    case _ => None
  }

  /** `sim ≥ t` / `sim > t` (either literal side) with sim in the engine's
    * canonical ranking form — `round(cosine_sim(attr, <literal vec>), 6)`,
    * or the bare cosine when `allowRaw` (sound for the IVF bound, whose
    * slack covers raw floats; the GRAPH walk's own ≥ t cut is on round-6
    * sims, so its rewrite requires the round form). ONE definition shared
    * by both range rewrites. Returns (ranked attr, query vector, t).
    */
  def thresholdConjunct(e: Expression, allowRaw: Boolean): Option[(AttributeReference, Array[Double], Double)] = {
    def sim(x: Expression): Option[(AttributeReference, Array[Double])] = x match {
      case r: Round => r.scale match {
        case Literal(6, IntegerType) => bare(r.child)
        case _ => None
      }
      case _ if allowRaw => bare(x)
      case _ => None
    }
    def bare(x: Expression): Option[(AttributeReference, Array[Double])] = x match {
      case CosineSimilarity(a: AttributeReference, l: Literal) =>
        literalVec(l).map((a, _))
      case CosineSimilarity(l: Literal, a: AttributeReference) =>
        literalVec(l).map((a, _))
      case _ => None
    }
    e match {
      case GreaterThanOrEqual(s, t: Literal) =>
        for { (a, q) <- sim(s); tv <- thresholdOf(t) } yield (a, q, tv)
      case GreaterThan(s, t: Literal) =>
        for { (a, q) <- sim(s); tv <- thresholdOf(t) } yield (a, q, tv)
      case LessThanOrEqual(t: Literal, s) =>
        for { (a, q) <- sim(s); tv <- thresholdOf(t) } yield (a, q, tv)
      case LessThan(t: Literal, s) =>
        for { (a, q) <- sim(s); tv <- thresholdOf(t) } yield (a, q, tv)
      case _ => None
    }
  }

  /** Resolve an attribute-valued comparison side through the spine's
    * Projects (the pre-pushdown shape `withColumn("sim", …).filter(…)`,
    * where the Filter still references the alias).
    */
  def resolveThresholdAlias(e: Expression, child: LogicalPlan): Expression = {
    def resolve(x: Expression): Expression = x match {
      case a: AttributeReference =>
        child.collect { case p: Project => p.projectList }.flatten
          .collectFirst { case al: Alias if al.exprId == a.exprId => al.child }
          .getOrElse(x)
      case other => other
    }
    e match {
      case GreaterThanOrEqual(s, t: Literal) => GreaterThanOrEqual(resolve(s), t)
      case GreaterThan(s, t: Literal) => GreaterThan(resolve(s), t)
      case LessThanOrEqual(t: Literal, s) => LessThanOrEqual(t, resolve(s))
      case LessThan(t: Literal, s) => LessThan(t, resolve(s))
      case other => other
    }
  }

  /** [[thresholdConjunct]]'s two-attribute (batch) form: `sim ≥ t` where
    * sim is the canonical cosine between TWO attributes — the corpus
    * embedding and a query-side vector. ONE definition beside the
    * literal form so the single and batch faces can never accept
    * different shapes. Returns (attrA, attrB, t) with the caller
    * responsible for orienting corpus vs query side.
    */
  def thresholdPairConjunct(e: Expression, aliasScope: LogicalPlan,
                            allowRaw: Boolean): Option[(AttributeReference, AttributeReference, Double)] = {
    def sim(x: Expression): Option[(AttributeReference, AttributeReference)] = x match {
      case r: Round => r.scale match {
        case Literal(6, IntegerType) => bare(r.child)
        case _ => None
      }
      case other if allowRaw => bare(other)
      case _ => None
    }
    def bare(x: Expression): Option[(AttributeReference, AttributeReference)] = x match {
      case CosineSimilarity(a: AttributeReference, b: AttributeReference) => Some((a, b))
      case _ => None
    }
    resolveThresholdAlias(e, aliasScope) match {
      case GreaterThanOrEqual(s, t: Literal) =>
        for { (a, b) <- sim(s); tv <- thresholdOf(t) } yield (a, b, tv)
      case GreaterThan(s, t: Literal) =>
        for { (a, b) <- sim(s); tv <- thresholdOf(t) } yield (a, b, tv)
      case LessThanOrEqual(t: Literal, s) =>
        for { (a, b) <- sim(s); tv <- thresholdOf(t) } yield (a, b, tv)
      case LessThan(t: Literal, s) =>
        for { (a, b) <- sim(s); tv <- thresholdOf(t) } yield (a, b, tv)
      case _ => None
    }
  }

  /** THE cell-prune predicate matcher — In/InSet and the EqualTo form
    * OptimizeIn folds a single-element IN into, both literal orders. ONE
    * definition for every idempotence/precedence guard that must detect
    * an injected cell prune (this exact drift class — one copy missing
    * the folded form — already caused a duplicate-prune re-fire once).
    */
  def cellPrunePredicate(cellAttr: AttributeReference): Expression => Boolean =
    (e: Expression) => e.exists {
      case org.apache.spark.sql.catalyst.expressions.In(a: AttributeReference, _) =>
        a.exprId == cellAttr.exprId
      case org.apache.spark.sql.catalyst.expressions.InSet(a: AttributeReference, _) =>
        a.exprId == cellAttr.exprId
      case EqualTo(a: AttributeReference, _: Literal) => a.exprId == cellAttr.exprId
      case EqualTo(_: Literal, a: AttributeReference) => a.exprId == cellAttr.exprId
      case _ => false
    }

  /** [[cellPrunePredicate]]'s ID-side twin — the matcher every graph
    * rule's idempotence guard shares: an injected `id IN (<beam/pool>)`,
    * the InSet form OptimizeIn converts large lists into, and the
    * EqualTo form a 1-element In folds into (both literal orders).
    * Matched at TOP-LEVEL-CONJUNCT granularity, not `exists` — a benign
    * user exclusion `NOT (id = 5)` CONTAINS an EqualTo(id, lit) node, and
    * an exists-descent would misread it as an injected prune, silencing
    * the rule on exactly the queries the benign-exclusion audit admits.
    */
  def idPrunePredicate(idAttr: AttributeReference): Expression => Boolean =
    (e: Expression) => conjuncts(e).exists {
      case org.apache.spark.sql.catalyst.expressions.In(a: AttributeReference, _) =>
        a.exprId == idAttr.exprId
      case org.apache.spark.sql.catalyst.expressions.InSet(a: AttributeReference, _) =>
        a.exprId == idAttr.exprId
      case EqualTo(a: AttributeReference, _: Literal) => a.exprId == idAttr.exprId
      case EqualTo(_: Literal, a: AttributeReference) => a.exprId == idAttr.exprId
      case _ => false
    }

  /** k from a batch top-k filter's rank bound — the WHOLE condition must
    * be the bound (any extra conjunct shapes the per-qid row count). ONE
    * definition shared by the graph and IVF batch top-k rewrites.
    */
  def rankBound(cond: Expression, rnk: AttributeReference): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rnk.exprId => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rnk.exprId => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rnk.exprId => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rnk.exprId => Some(k - 1)
    case _ => None
  }

  /** Freshness component for rewrite-probe memo keys: a digest of every
    * file-backed relation's input file paths under the panel subplan. A
    * CANONICALIZED plan alone is NOT a sound memo key across separately
    * built queries — HadoopFsRelation equality is rootPaths-only, so a
    * panel table whose DATA changed between two queries canonicalizes
    * equal and would serve stale admissions (review finding: the prior
    * exprId-bearing key never hit cross-query, so the canonicalized
    * re-key silently introduced this class). Parquet writes mint fresh
    * part-file names, so any append/overwrite changes this digest; a
    * listing Spark itself serves stale (no refreshByPath) is stale for
    * the unrewritten plan too and is not the memo's bug. Uses the file
    * index's cached listing — no I/O at rewrite time.
    */
  private val digestNonce = new java.util.concurrent.atomic.AtomicLong(1L)

  def inputFilesDigest(p: LogicalPlan): Long = {
    var h = 1125899906842597L // FNV-ish fold, order-independent via sort
    var opaque = false
    p.foreach {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles.sorted.foreach { f =>
              h = h * 31 + f.hashCode
            }
          // a non-file V1 relation (JDBC, …) has no listing to digest —
          // treat as opaque below
          case _ => opaque = true
        }
      case lr: org.apache.spark.sql.catalyst.plans.logical.LeafNode
        if !lr.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation] &&
          !lr.isInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation] =>
        // any other leaf (DSv2 relation, stream source, view stub) backs
        // data this digest cannot see — FAIL SAFE: a fresh nonce makes
        // the memo never hit for such panels, trading memoization for
        // correctness (review finding: a constant here re-opened the
        // stale-admissions class for non-V1 sources)
        opaque = true
      case _ => ()
    }
    if (opaque) digestNonce.incrementAndGet() else h
  }

  /** Crude-but-safe bound for the probe memos: past the cap the whole
    * map clears (it is a cache — a re-probe is one API-panel job). The
    * keys retain canonicalized plan trees, so unbounded growth across a
    * long session of distinct panel shapes would pin file listings on
    * the driver (review finding).
    */
  val ProbeMemoCap = 256
  def boundedPut[K, V](memo: java.util.concurrent.ConcurrentHashMap[K, V],
                       k: K, v: V): Unit = {
    if (memo.size >= ProbeMemoCap) memo.clear()
    memo.putIfAbsent(k, v)
  }

  /** Bounded negative-cache admission for probe EXCEPTION declines: the
    * first [[ProbeFailRetries]]−1 failures of a key re-probe on later
    * passes (a transient blip must not pin the exact scan for the
    * generation), after which the decline memoizes like a shape-decline —
    * a PERSISTENT fault (corrupt panel file, revoked credentials) must
    * not re-run a failing driver collect on every optimization of every
    * query (round-13 second-pass review finding). Returns true when the
    * caller should memoize the decline now. Keys carry the generation, so
    * a maintenance fix naturally resets the budget; the counter map is
    * size-guarded like every probe memo.
    */
  val ProbeFailRetries = 3
  private val failCounts =
    new java.util.concurrent.ConcurrentHashMap[Any, Integer]()
  def probeFailureExhausted(key: Any): Boolean = {
    if (failCounts.size >= ProbeMemoCap) failCounts.clear()
    val n = failCounts.merge(key, 1, (a, b) => a + b)
    if (n >= ProbeFailRetries) { failCounts.remove(key); true } else false
  }

  /** Tag stamped on the LocalRelation a batch rewrite injects as its
    * per-qid semi-join table — the idempotence/provenance marker the
    * house discipline prefers over name matching (round-11 verdict #7:
    * a user column literally named `__graft_qid` must not read as "the
    * rewrite fired"). The value names the rule family ("hnsw-batch",
    * "ivf-batch").
    */
  val InjectedMarker: org.apache.spark.sql.catalyst.trees.TreeNodeTag[String] =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[String]("graft.injectedBatchMarker")

  /** Attribute-metadata key carrying the same marker value on the
    * injected LocalRelation's OUTPUT attributes — the round-13 closure of
    * the round-12 verdict's name-fallback note. The node tag alone is NOT
    * rebuild-proof (measured: InferFiltersFromConstraints pushes an
    * inferred predicate onto the semi-join's local side and
    * ConvertToLocalRelation folds Filter(LocalRelation) into a NEW
    * LocalRelation — same output attributes, tag gone), and name matching
    * was the old second line. Attribute metadata closes the gap without
    * names: every rebuild Catalyst performs on a resolved plan preserves
    * the attribute instances (rebuilding them would break the join
    * condition's exprId references), so the marker rides the attributes —
    * and a user column can only carry it by deliberately forging the key,
    * not by an unlucky name.
    */
  val MarkerMetaKey = "graft.injectedBatchMarker"

  /** An injected-marker attribute: non-nullable, metadata-stamped. */
  def markerAttr(name: String, dt: org.apache.spark.sql.types.DataType,
                 marker: String): AttributeReference =
    AttributeReference(name, dt, nullable = false,
      new org.apache.spark.sql.types.MetadataBuilder()
        .putString(MarkerMetaKey, marker).build())()

  /** The marker value of an injected LocalRelation, if any: the node tag
    * when it survived, else the attribute metadata (rebuild-proof line).
    */
  def injectedMarkerOf(lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation): Option[String] =
    lr.getTagValue(InjectedMarker).orElse(lr.output.collectFirst {
      case a if a.metadata.contains(MarkerMetaKey) =>
        a.metadata.getString(MarkerMetaKey)
    })

  /** All threshold conjuncts of a Filter condition that rank the given
    * embedding attribute, alias-resolved through the spine — the shared
    * front half of both range rewrites. Returns (query vector, t) pairs.
    */
  def thresholdMatches(cond: Expression, child: LogicalPlan,
                       embAttr: AttributeReference,
                       allowRaw: Boolean): Seq[(Array[Double], Double)] =
    conjuncts(cond)
      .map { c => thresholdConjunct(c, allowRaw) match {
        case None => thresholdConjunct(resolveThresholdAlias(c, child), allowRaw)
        case some => some
      }}
      .collect { case Some((a, q, t)) if a.exprId == embAttr.exprId => (q, t) }

  /** Some(#distinct excluded ids) iff EVERY conjunct of every condition is
    * a provably benign id exclusion: `NOT (id = <literal>)` or
    * `IS NOT NULL(id)` (matched by exprId against the registered
    * relation's id attribute, so an identically-named column from
    * elsewhere can never pass). Anything else — ranges, IN lists, non-id
    * references — returns None and the caller falls through. ONE
    * definition shared by the single-query and batch graph rewrites: the
    * k + e ≤ Ef headroom argument (the unfiltered top-(k+e) ⊆ the beam
    * provably contains the filtered top-k) is identical on both faces.
    */
  def benignExclusions(conds: Seq[Expression],
                       idAttr: AttributeReference): Option[Int] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val excluded = scala.collection.mutable.Set[Any]()
    val ok = conds.flatMap(conjuncts).forall {
      case Not(EqualTo(a: AttributeReference, l: Literal))
        if a.exprId == idAttr.exprId => excluded += l.value; true
      case Not(EqualTo(l: Literal, a: AttributeReference))
        if a.exprId == idAttr.exprId => excluded += l.value; true
      case IsNotNull(a: AttributeReference)
        if a.exprId == idAttr.exprId => true
      case _ => false
    }
    if (ok) Some(excluded.size) else None
  }
}
