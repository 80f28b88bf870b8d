package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the streaming idempotency-key derivation (ADVICE r12): the
  * stream identity inside a commit key must be collision-resistant —
  * two distinct streams ingesting into one store always align on
  * batchId (both start at 0), so a colliding stream id would make the
  * later stream's publishes silently skip as already-published.
  */
class StreamingKeySpec extends AnyFunSuite {

  test("commitKey separates checkpoint paths whose String.hashCode " +
      "collides") {
    // "Aa" and "BB" are the canonical 32-bit hashCode collision; under
    // the old f"ck${path.hashCode}%08x" scheme these two streams shared
    // an identity and batch 0 of the second silently skipped
    val a = "/ckpt/Aa"
    val b = "/ckpt/BB"
    assert(a.hashCode == b.hashCode, "fixture must be a hash collision")
    assert(StreamingIngest.commitKey(a, 0L) !=
      StreamingIngest.commitKey(b, 0L))
  }

  test("commitKey is deterministic across calls and distinct per batch") {
    val k1 = StreamingIngest.commitKey("/durable/ckpt", 7L)
    assert(k1 == StreamingIngest.commitKey("/durable/ckpt", 7L))
    assert(k1 != StreamingIngest.commitKey("/durable/ckpt", 8L))
    // shape: the store sanitizes keys to [0-9a-zA-Z_]; hex digest +
    // batch id survive sanitization losslessly
    assert(k1.matches("ck[0-9a-f]{16}-b7"))
  }
}
