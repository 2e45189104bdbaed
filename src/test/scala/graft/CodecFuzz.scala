package graft

import org.scalatest.Assertions._

/** Shared truncation/bit-flip sweep used by [[CodecRobustnessSpec]]
  * (writer-produced fixtures) and the format specs' own hand-built
  * fixture sweeps (the v4/EA/B-tree-v2 chunk indexes, dense storage —
  * the decode paths with the most geometry arithmetic): every mutant
  * must decode or refuse with a messaged IllegalArgumentException.
  * `step` thins the sweep for larger fixtures (every boundary is
  * still a product of some flip at step ≤ 2 across rounds of the
  * suite; the goal is class coverage, not exhaustiveness). */
object CodecFuzz {
  def sweep(name: String, fixture: Array[Byte],
      dec: Array[Byte] => Any, step: Int = 1): Unit = {
    def attempt(tag: String, bytes: Array[Byte]): Unit =
      try { dec(bytes); () } catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage != null && e.getMessage.nonEmpty,
            s"$name $tag: refusal without a message")
        case e: Throwable =>
          fail(s"$name $tag: raw ${e.getClass.getName}: ${e.getMessage}")
      }
    var len = 0
    while (len < fixture.length) {
      attempt(s"truncated@$len", java.util.Arrays.copyOf(fixture, len))
      len += step
    }
    var pos = 0
    while (pos < fixture.length) {
      var bi = 0
      while (bi < 3) {
        val bit = Seq(0, 3, 7)(bi)
        val mut = fixture.clone()
        mut(pos) = (mut(pos) ^ (1 << bit)).toByte
        attempt(s"bitflip@$pos.$bit", mut)
        bi += 1
      }
      pos += step
    }
  }
}
