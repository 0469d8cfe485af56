package graft

import graft.functions.kernels.BehaviorKernels
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the behavior kernels against naive reference
  * implementations: the compiled greedy funnel scan must equal the
  * obvious sequential-min recursion on arbitrary event sets (including
  * timestamp ties and adversarial stage orders), and the advance
  * timestamps must be consistent with the depth. */
object BehaviorKernelPropertySpec extends Properties("BehaviorKernels") {

  private val numStages = 3

  /** (ts, stage) events with small ts ranges to force collisions. */
  private val genEvents: Gen[List[(Long, Int)]] =
    Gen.listOf(for {
      ts <- Gen.choose(0L, 30L)
      st <- Gen.choose(1, numStages)
    } yield (ts, st))

  /** Naive reference: stage k's advance time = min event time strictly
    * after stage k-1's advance time — the oracle-CTE semantics. */
  private def naiveAdvances(evs: List[(Long, Int)]): List[Long] = {
    var last = Long.MinValue
    var out = List.empty[Long]
    var stage = 1
    var continue = true
    while (continue && stage <= numStages) {
      val candidates = evs.filter(e => e._2 == stage && e._1 > last)
      if (candidates.isEmpty) continue = false
      else {
        val t = candidates.map(_._1).min
        out = out :+ t
        last = t
        stage += 1
      }
    }
    out
  }

  private def packed(evs: List[(Long, Int)]): GenericArrayData =
    new GenericArrayData(
      evs.map { case (ts, st) => (ts << 3) | st.toLong }.sorted.toArray)

  property("funnelDepth equals the sequential-min reference") =
    Prop.forAll(genEvents) { evs =>
      BehaviorKernels.funnelDepth(packed(evs), numStages) ==
        naiveAdvances(evs).length
    }

  property("funnelAdvanceTs equals the sequential-min advance times") =
    Prop.forAll(genEvents) { evs =>
      val got = BehaviorKernels.funnelAdvanceTs(packed(evs), numStages)
        .toLongArray().toList
      got == naiveAdvances(evs)
    }

  property("advance times are strictly increasing and stage-consistent") =
    Prop.forAll(genEvents) { evs =>
      val adv = BehaviorKernels.funnelAdvanceTs(packed(evs), numStages)
        .toLongArray().toList
      adv.sliding(2).forall { case a :: b :: Nil => a < b; case _ => true }
    }

  private def naiveWithin(evs: List[(Long, Int)], w: Long): Int = {
    val views = evs.filter(_._2 == 1).map(_._1)
    if (views.isEmpty) return 0
    val t1 = views.min
    var last = t1
    var stage = 2
    while (stage <= numStages) {
      val c = evs.filter(e => e._2 == stage && e._1 > last && e._1 - t1 <= w)
      if (c.isEmpty) return stage - 1
      last = c.map(_._1).min
      stage += 1
    }
    numStages
  }

  property("funnelDepthWithin(MaxValue) degenerates to funnelDepth") =
    Prop.forAll(genEvents) { evs =>
      BehaviorKernels.funnelDepthWithin(packed(evs), numStages, Long.MaxValue) ==
        BehaviorKernels.funnelDepth(packed(evs), numStages)
    }

  property("funnelDepthWithin equals the anchored sequential-min reference") =
    Prop.forAll(genEvents, Gen.choose(1L, 20L)) { (evs, w) =>
      BehaviorKernels.funnelDepthWithin(packed(evs), numStages, w) ==
        naiveWithin(evs, w)
    }
}
