package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 pins that need no SparkSession. */
class Round12Spec extends AnyFunSuite {

  test("dirBytes: an FS ERROR sizes at the cap, not the local floor (advisor find)") {
    // a missing path is a legitimate 0 (local-test floor)…
    assert(GraftSession.dirBytes("/definitely/not/a/real/path") == 0L)
    // …but a sizing FAILURE (bogus scheme → FS error) must not floor a
    // scale run to 32 partitions: it returns the cap-sized sentinel
    val b = GraftSession.dirBytes("bogus-scheme://host/data")
    assert(GraftSession.derivedShufflePartitions(b, 32) == 4096,
      s"error fallback must derive the 4096 cap, got bytes=$b")
  }
}
