package graft.operators

import graft.model.TableDef

/** Retry/backoff decorator for any [[Backfill.EntityFetcher]] — the
  * resilience the reference gets from its API client's automatic
  * retries (exponential backoff on rate limits / transient 5xx):
  * every fetch call is retried up to `maxAttempts` with delay
  * base·2^(attempt−1).
  *
  * Only TRANSIENT failures retry (`retryOn`, default: IO / timeout /
  * interrupted-IO exception classes — the network-shaped errors a
  * remote API emits). Deterministic failures (auth errors, malformed
  * requests, NPEs) rethrow immediately instead of burning
  * maxAttempts·backoff masking the real error class.
  *
  * `list` streams pages lazily, so a failure can also happen MID-
  * iteration. Recovery re-lists from the start and suppresses rows
  * already emitted by VALUE (a 64-bit FNV-1a hash per emitted row, kept
  * in memory for the life of the iterator): under a stable cursor
  * ordering this resumes exactly where the old cursor died, and under
  * an UNSTABLE ordering (rows shifted by concurrent inserts — e.g. a
  * reverse-created listing growing at the head) no unseen row is ever
  * skipped, because suppression matches row content, never a position
  * count. Failure modes left: a 64-bit hash collision drops/duplicates
  * one row (~2⁻⁶⁴ per pair), and a row the SOURCE legitimately emits
  * twice is emitted once per distinct retry window — both absorbed by
  * the idempotent LWW/guarded merge downstream, composing with the
  * sink's replay safety rather than needing exactly-once bookkeeping.
  * Memory: ~18 bytes per emitted row (primitive open-addressed long
  * set at ≤ 50% load — no per-row boxing), bounded by one entity scan;
  * a paginated SaaS listing (100 rows/call) keeps this in the tens of
  * MB even at 10⁷-row backfills.
  *
  * `sleeper` is injectable so specs assert the backoff schedule instead
  * of sleeping through it. Serializable like the seam it wraps (the
  * dependent-scan path calls fetchers from executor partitions). */
class RetryingFetcher(inner: Backfill.EntityFetcher,
                      maxAttempts: Int = 3,
                      baseDelayMs: Long = 200L,
                      sleeper: Long => Unit = Thread.sleep,
                      retryOn: Throwable => Boolean = RetryingFetcher.transient)
    extends Backfill.EntityFetcher {

  private def backoff(attempt: Int): Unit =
    sleeper(baseDelayMs << (attempt - 1))

  private def retry[T](f: => T): T = {
    var attempt = 1
    while (true) {
      try return f
      catch {
        case e: Exception if attempt < maxAttempts && retryOn(e) =>
          backoff(attempt); attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def list(tdef: TableDef, createdGte: Option[Long],
                    createdLt: Option[Long]): Iterator[String] =
    new Iterator[String] {
      private val emitted = new RetryingFetcher.LongSet()
      private var it = retry(inner.list(tdef, createdGte, createdLt))
      private def recovering[T](f: => T): T = {
        var attempt = 1
        while (true) {
          try return f
          catch {
            case e: Exception if attempt < maxAttempts && retryOn(e) =>
              backoff(attempt); attempt += 1
              // restart the cursor, suppressing already-emitted rows by
              // content hash — position-independent, so an ordering
              // shift between listings can never hide an unseen row
              it = retry(inner.list(tdef, createdGte, createdLt)
                .filterNot(row => emitted.contains(RetryingFetcher.fnv64(row))))
          }
        }
        throw new IllegalStateException("unreachable")
      }
      def hasNext: Boolean = recovering(it.hasNext)
      def next(): String = {
        val v = recovering(it.next())
        emitted.add(RetryingFetcher.fnv64(v))
        v
      }
    }

  override def retrieve(tdef: TableDef, id: String): Option[String] =
    retry(inner.retrieve(tdef, id))

  override def listForParent(tdef: TableDef, parentCol: String,
                             parentId: String): Seq[String] =
    retry(inner.listForParent(tdef, parentCol, parentId))

  override def expandList(tdef: TableDef, entityId: String,
                          listField: String): Option[String] =
    retry(inner.expandList(tdef, entityId, listField))
}

object RetryingFetcher {

  /** Default transient-failure predicate: the network-shaped exception
    * classes (connection reset, timeout, rate-limit surfaced as IO).
    * Anything else — auth, malformed request, NPE — is deterministic
    * and rethrows immediately. */
  val transient: Throwable => Boolean = {
    case _: java.io.IOException                     => true
    case _: java.util.concurrent.TimeoutException   => true
    case e: java.io.UncheckedIOException            => e.getCause != null
    case _                                          => false
  }

  /** Minimal open-addressed primitive long set (linear probing, ≤ 50%
    * load): ~18 bytes/element vs ~48 for HashSet[java.lang.Long]'s boxed
    * entries — the emitted-row tracker grows with every row of a scan,
    * so the constant factor is the difference between tens of MB and GB
    * on a large backfill. */
  private[operators] final class LongSet(initialCapacity: Int = 1 << 10) {
    private var keys = new Array[Long](initialCapacity)
    private var used = new Array[Boolean](initialCapacity)
    private var n = 0
    private def slot(k: Long, cap: Int): Int = {
      val h = k ^ (k >>> 32)
      ((h * 0x9E3779B97F4A7C15L) >>> 33).toInt & (cap - 1)
    }
    def contains(k: Long): Boolean = {
      var i = slot(k, keys.length)
      while (used(i)) {
        if (keys(i) == k) return true
        i = (i + 1) & (keys.length - 1)
      }
      false
    }
    def add(k: Long): Unit = {
      if ((n + 1) * 2 > keys.length) grow()
      var i = slot(k, keys.length)
      while (used(i)) {
        if (keys(i) == k) return
        i = (i + 1) & (keys.length - 1)
      }
      keys(i) = k; used(i) = true; n += 1
    }
    private def grow(): Unit = {
      val (ok, ou) = (keys, used)
      keys = new Array[Long](ok.length * 2)
      used = new Array[Boolean](ok.length * 2)
      n = 0
      var i = 0
      while (i < ok.length) {
        if (ou(i)) add(ok(i))
        i += 1
      }
    }
  }

  /** 64-bit FNV-1a over the row text — the emitted-row fingerprint. */
  private[operators] def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
