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
  * Memory: 8 boxed longs per emitted row, bounded by one entity scan.
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
      private val emitted = scala.collection.mutable.HashSet.empty[Long]
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
        emitted += RetryingFetcher.fnv64(v)
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
