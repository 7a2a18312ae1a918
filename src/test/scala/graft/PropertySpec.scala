package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.color.{CandNode, GreedyIS}
import graft.functions.{CosineSim, SortedIntersectValues, SqDistLong, SrpBucket}

/** Property-based checks: the codegen expression kernels against naive
  * reference models over RANDOM inputs (the corpus-data specs pin them on
  * real 64-dim/sorted shapes; these sweep the input space), plus GreedyIS
  * independence/maximality under arbitrary bucket partitionings — the law
  * that makes its partial/merge execution correct on ANY shuffle layout.
  * All pure-JVM: no Spark jobs, so hundreds of cases run in milliseconds.
  */
class PropertySpec extends AnyFunSuite {

  private def arr(xs: Seq[Long]) = new GenericArrayData(xs.toArray)
  private def darr(xs: Seq[Double]) = new GenericArrayData(xs.toArray)

  /** Run a scalacheck property (200 cases) inside a scalatest test. */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("graft_sorted_intersect == sorted toSet intersect on sorted distinct arrays") {
    val gen = Gen.zip(
      Gen.listOf(Gen.chooseNum(-100L, 100L)), Gen.listOf(Gen.chooseNum(-100L, 100L)))
    check(Prop.forAll(gen) { case (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      SortedIntersectValues.compute(arr(sa), arr(sb)).toLongArray().toSeq ==
        sa.toSet.intersect(sb.toSet).toSeq.sorted
    })
  }

  test("graft_sqdist_long == naive fold, order-independent (integer addition commutes)") {
    val gen = Gen.chooseNum(0, 80).flatMap { n =>
      Gen.zip(
        Gen.listOfN(n, Gen.chooseNum(-1000000L, 1000000L)),
        Gen.listOfN(n, Gen.chooseNum(-1000000L, 1000000L)))
    }
    check(Prop.forAll(gen) { case (a, b) =>
      val naive = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      SqDistLong.compute(arr(a), arr(b)) == naive &&
        SqDistLong.compute(arr(a.reverse), arr(b.reverse)) == naive
    })
  }

  test("graft_cosine is bit-identical to the strict left-to-right IEEE fold") {
    val gen = Gen.chooseNum(1, 80).flatMap { n =>
      Gen.zip(
        Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0)),
        Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0)))
    }
    check(Prop.forAll(gen) { case (a, b) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.zip(b).foreach { case (x, y) => dot += x * y; na += x * x; nb += y * y }
      val expected = dot / (math.sqrt(na) * math.sqrt(nb))
      // Bit-level equality (NaN-safe), not epsilon: the contract is the
      // exact fold order the composed HOF form and the oracle use.
      java.lang.Double.doubleToLongBits(CosineSim.compute(darr(a), darr(b))) ==
        java.lang.Double.doubleToLongBits(expected)
    })
  }

  test("graft_srp_bucket bit p == sign of plane p's exact dot product") {
    val gen = for {
      dims <- Gen.chooseNum(1, 16)
      bits <- Gen.chooseNum(0, 8)
      sv <- Gen.listOfN(dims, Gen.chooseNum(-1000000L, 1000000L))
      signs <- Gen.listOfN(bits * dims, Gen.oneOf(-1L, 1L))
    } yield (dims, bits, sv, signs)
    check(Prop.forAll(gen) { case (dims, bits, sv, signs) =>
      val bucket = SrpBucket.compute(arr(sv), arr(signs), bits)
      val bitsOk = (0 until bits).forall { p =>
        val proj = (0 until dims).map(i => sv(i) * signs(p * dims + i)).sum
        ((bucket >> p) & 1L) == (if (proj > 0) 1L else 0L)
      }
      bitsOk && (bucket >> bits) == 0L // no bits set past the planes
    })
  }

  /** Random bucket: n nodes, each undirected edge present independently. */
  private val bucketGen: Gen[IndexedSeq[CandNode]] = for {
    n <- Gen.chooseNum(0, 18)
    pairs = for (i <- 0 until n; j <- i + 1 until n) yield (i.toLong, j.toLong)
    picked <- Gen.sequence[Seq[Boolean], Boolean](pairs.map(_ => Gen.prob(0.25)))
  } yield {
    val adj = pairs.zip(picked).filter(_._2).map(_._1)
    val nbrs = adj.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toArray).toMap
    (0L until n.toLong).map { i =>
      val nb = nbrs.getOrElse(i, Array.empty[Long])
      CandNode(i, nb.length, nb)
    }
  }

  test("GreedyIS under ANY partition split: independent set + nonempty-bucket progress") {
    // NOT asserted: bucket-wide maximality, or even top-priority-node
    // admission — the streaming partial phase admits in ARRIVAL order, so a
    // lower-priority neighbor arriving first can prune the bucket's top node
    // (found by this very property; GreedyIS scaladoc documents it). The
    // guaranteed invariants, which the kernel's progress argument uses, are
    // exactly: every output is an independent set, and a nonempty bucket
    // admits at least one node.
    val gen = Gen.zip(bucketGen, Gen.chooseNum(0, 17), Gen.long)
    check(Prop.forAll(gen) { case (nodes, splitAt, shuffleSeed) =>
      // Arbitrary partitioning: shuffle the bucket, split into two partial
      // folds, merge — exactly what aggregateByKey does on a real shuffle.
      val perm = new scala.util.Random(shuffleSeed).shuffle(nodes.toVector)
      val (pa, pb) = perm.splitAt(math.min(splitAt, perm.size))
      val admitted = GreedyIS.finish(GreedyIS.merge(
        pa.foldLeft(GreedyIS.zero)(GreedyIS.reduce),
        pb.foldLeft(GreedyIS.zero)(GreedyIS.reduce))).toSet
      val byId = nodes.map(n => n.id -> n).toMap
      val independent = admitted.forall(id => byId(id).nbrs.forall(!admitted(_)))
      val progress = nodes.isEmpty || admitted.nonEmpty
      independent && progress
    })
  }

  test("GreedyIS single-fold (one partition) is additionally MAXIMAL in the bucket") {
    val gen = Gen.zip(bucketGen, Gen.long)
    check(Prop.forAll(gen) { case (nodes, shuffleSeed) =>
      val perm = new scala.util.Random(shuffleSeed).shuffle(nodes.toVector)
      val admitted = GreedyIS.finish(
        perm.foldLeft(GreedyIS.zero)(GreedyIS.reduce)).toSet
      val byId = nodes.map(n => n.id -> n).toMap
      val independent = admitted.forall(id => byId(id).nbrs.forall(!admitted(_)))
      val maximal = nodes.forall(n => admitted(n.id) || n.nbrs.exists(admitted))
      independent && maximal
    })
  }
}
