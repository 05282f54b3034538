package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.operators.BandStore
import org.apache.spark.sql.functions._

/** The pointer seam (VERDICT r08 task 6): store logic must be identical
  * under the in-memory pointer (single-driver default) and the
  * file-backed atomic-rename pointer — and the file pointer buys
  * restart adoption: a NEW JVM's store instance re-registers the
  * surviving segment directories as bucketed external tables, same
  * content, same shuffle-free probe plan, replay guard included. */
class StorePointerSpec extends SparkSpec {

  test("file pointer: atomic replace round-trips payloads") {
    val p = Files.createTempDirectory("graft-ptr").resolve("ptr")
    val fp = new FilePointer(p)
    assert(fp.read().isEmpty)
    fp.write("1;42;;")
    assert(fp.read().contains("1;42;;"))
    fp.write("3;44;1,2;")
    assert(fp.read().contains("3;44;1,2;"))
  }

  test("CAS file pointer: round-trip, stale expect fails, restart adoption") {
    val dir = Files.createTempDirectory("graft-ptr-cas")
    val p = new CasFilePointer(dir)
    assert(p.read().isEmpty)
    // initial publish must expect None
    assert(!p.compareAndSwap(Some("ghost"), "a"))
    assert(p.compareAndSwap(None, "a") && p.read().contains("a"))
    // stale expect (None, or an old payload) must fail without moving
    assert(!p.compareAndSwap(None, "b") && p.read().contains("a"))
    assert(p.compareAndSwap(Some("a"), "b") && p.read().contains("b"))
    assert(!p.compareAndSwap(Some("a"), "c") && p.read().contains("b"))
    // unconditional write still lands (fresh generation)
    p.write("c")
    assert(p.read().contains("c"))
    // generation files outlive the instance: restart adoption
    assert(new CasFilePointer(dir).read().contains("c"))
    // old generations are pruned — the directory stays bounded
    (1 to 40).foreach(i => p.write(s"v$i"))
    assert(Files.list(dir).count() <= 9, "generation files must be pruned")
    assert(p.read().contains("v40"))
  }

  test("CAS contention: one publisher per observed state wins, no lost update") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    for (p <- Seq(new InMemoryCasPointer,
        new CasFilePointer(Files.createTempDirectory("graft-ptr-race")))) {
      // phase 1: N writers race a SINGLE CAS from the same observed
      // state — exactly one must win
      p.write("base")
      val n = 8
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(n)
      val oneShot = (1 to n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            start.countDown(); start.await()
            p.compareAndSwap(Some("base"), s"w$i")
          }
        })
      }
      assert(oneShot.count(_.get()) == 1,
        "exactly one same-expect publisher may win")
      // phase 2: each writer appends its id via a CAS retry loop — the
      // multi-driver publish protocol; every update must survive
      val go = new CountDownLatch(1)
      val loops = (1 to n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            go.countDown(); go.await()
            var done = false
            while (!done) {
              val cur = p.read()
              done = p.compareAndSwap(cur, cur.getOrElse("") + s",$i")
            }
          }
        })
      }
      loops.foreach(_.get())
      pool.shutdown()
      assert(pool.awaitTermination(30, TimeUnit.SECONDS))
      val fin = p.read().get
      (1 to n).foreach(i => assert(fin.contains(s",$i"),
        s"update $i lost from '$fin' — CAS retry loop must never drop a write"))
    }
  }

  test("store behaves identically on all pointer impls (incl. CAS)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-ptr-band")
    val stores = Seq(
      new BandStore("graft_ptr_mem", buckets = 2),
      new BandStore("graft_ptr_file", buckets = 2,
        pointer = new FilePointer(dir.resolve("band.ptr"))),
      // the CAS impls drive the store's conditional-publish path — the
      // same merges/replays/compactions must behave identically
      new BandStore("graft_ptr_casmem", buckets = 2,
        pointer = new InMemoryCasPointer),
      new BandStore("graft_ptr_casfile", buckets = 2,
        pointer = new CasFilePointer(dir.resolve("band.cas"))))
    stores.foreach { st =>
      st.merge(Seq((1L, 0, "k1"), (2L, 0, "k2")).toDF("doc_id", "band", "band_key"),
        batchId = 0L)
      st.merge(Seq((3L, 1, "k1")).toDF("doc_id", "band", "band_key"), batchId = 1L)
      st.merge(Seq((3L, 1, "k1")).toDF("doc_id", "band", "band_key"), batchId = 1L)
      assert(st.table(spark).count() == 3, "replay must no-op on both impls")
      assert(st.isReplay(1L) && !st.isReplay(2L))
      st.compact(spark)
      assert(st.table(spark).count() == 3 && st.liveSegments.size == 1)
    }
  }

  test("restart adoption: a fresh store instance on the same file pointer sees the corpus") {
    val s = spark
    import s.implicits._
    val ptr = Files.createTempDirectory("graft-ptr-adopt").resolve("band.ptr")
    val a = new BandStore("graft_ptr_adopt", buckets = 2,
      pointer = new FilePointer(ptr))
    a.merge(Seq((1L, 0, "k1"), (2L, 0, "k2")).toDF("doc_id", "band", "band_key"),
      batchId = 5L)
    a.merge(Seq((3L, 1, "k3")).toDF("doc_id", "band", "band_key"), batchId = 6L)
    // model the restart: drop the session's catalog entries (the
    // in-memory catalog dies with the JVM; warehouse dirs and the
    // pointer file survive) and build a brand-new store instance
    a.liveSegments.foreach(k =>
      spark.sql(s"DROP TABLE IF EXISTS graft_ptr_adopt_s$k"))
    val b = new BandStore("graft_ptr_adopt", buckets = 2,
      pointer = new FilePointer(ptr))
    assert(b.table(spark).count() == 3,
      "adoption must re-register every surviving segment")
    assert(b.isReplay(6L) && !b.isReplay(7L),
      "the replay guard must survive the restart")
    // adopted external tables keep the bucket layout: bucket-key
    // aggregation over the compacted store runs with no Exchange
    b.compact(spark)
    val agg = b.table(spark).groupBy("band_key").count()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
      "adopted segments must keep the partitioning-reporting bucketed scan")
    // merging continues seamlessly after adoption
    b.merge(Seq((4L, 0, "k4")).toDF("doc_id", "band", "band_key"), batchId = 7L)
    assert(b.table(spark).count() == 4)
  }

  test("EmbStore threads the pointer seam to BOTH tables (restart adoption)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-ptr-emb")
    def mk() = new graft.operators.EmbStore("graft_ptr_emb", buckets = 2,
      bucketPointer = new FilePointer(dir.resolve("buckets.ptr")),
      vecPointer = new FilePointer(dir.resolve("vecs.ptr")))
    val one = Seq.fill(64)(1.0)
    val near = Seq.tabulate(64)(i => if (i == 0) 1.0 else 1.001)
    val ortho = Seq.tabulate(64)(i => if (i < 32) 1.0 else -1.0)

    val a = mk()
    a.ingest(Seq((1L, one), (2L, ortho)).toDF("vec_id", "embedding"),
      batchId = 4L)
    // model the restart: in-memory catalog entries die with the JVM;
    // warehouse dirs and both pointer files survive
    (1 to 4).foreach { k =>
      spark.sql(s"DROP TABLE IF EXISTS graft_ptr_emb_buckets_s$k")
      spark.sql(s"DROP TABLE IF EXISTS graft_ptr_emb_vecs_s$k")
    }
    val b = mk()
    // both tables adopted — a seam on only one of them would leave
    // candidates without vectors (or vectors without candidates)
    assert(b.vectorRows(spark).select("vec_id").as[Long].collect().toSet ==
      Set(1L, 2L))
    assert(b.bucketRows(spark).select("vec_id").distinct().as[Long]
      .collect().toSet == Set(1L, 2L))
    assert(b.isReplay(4L) && !b.isReplay(5L),
      "the shared replay guard must survive the restart on both tables")
    // the adopted corpus is probe-able: a near-dup of pre-restart vec 1
    // is found (a restart-amnesiac store would find nothing)
    val pairs = b.probe(Seq((10L, near)).toDF("vec_id", "embedding"),
      threshold = 0.9).select("vec_a", "vec_b").as[(Long, Long)].collect()
    assert(pairs.length == 1 &&
      Set(pairs.head._1, pairs.head._2) == Set(1L, 10L), s"got ${pairs.toSeq}")
    // and ingest continues seamlessly on the adopted base
    b.ingest(Seq((3L, near)).toDF("vec_id", "embedding"), batchId = 5L)
    assert(b.vectorRows(spark).count() == 3)
  }

  test("two drivers on one CAS pointer: no merge lost, no segment clobbered") {
    // the ADVICE r10 scenario: two store INSTANCES (two drivers — the
    // merge lock only serializes one JVM) share a CAS pointer and merge
    // concurrently. Ids are CLAIMED via the pointer before any file is
    // written, so the writers can never pick the same segment path —
    // under the old post-hoc id pick, the loser's pre-write cleanup
    // could delete the winner's already-published segment files.
    val s = spark
    import s.implicits._
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val cases = Seq[(String, CasStorePointer)](
      "graft_cas_two_writers_mem" -> new InMemoryCasPointer,
      "graft_cas_two_writers_file" -> new CasFilePointer(
        Files.createTempDirectory("graft-cas-2w")))
    for ((name, ptr) <- cases) {
      val a = new BandStore(name, buckets = 2, pointer = ptr)
      val b = new BandStore(name, buckets = 2, pointer = ptr)
      val pool = Executors.newFixedThreadPool(2)
      val go = new CountDownLatch(1)
      val writers = Seq(a -> 0, b -> 1).map { case (st, base) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            go.countDown(); go.await()
            (0 until 4).foreach { i =>
              val id = (base * 100 + i).toLong
              st.merge(Seq((id, 0, s"k$id")).toDF("doc_id", "band", "band_key"))
            }
          }
        })
      }
      writers.foreach(_.get())
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      // every merge from BOTH writers landed, exactly once
      val want = (0 until 4).flatMap(i => Seq(i.toLong, (100 + i).toLong)).toSet
      val got = a.table(spark).select("doc_id").as[Long].collect()
      assert(got.toSet == want, s"$name: lost/foreign rows: ${got.sorted.toSeq}")
      assert(got.length == want.size, s"$name: a clobbered manifest would " +
        "duplicate or drop segment rows")
      assert(a.liveSegments.size == 8 && a.liveSegments.distinct.size == 8,
        s"$name: claimed segment ids must be unique: ${a.liveSegments}")
      // compaction under the same two-instance setup stays consistent
      a.compact(spark)
      assert(b.table(spark).select("doc_id").as[Long].collect().toSet == want,
        s"$name: the other instance must see the compacted corpus")
    }
  }

  test("CAS file pointer: reads race a pruning publisher without error") {
    // keepGens=1 makes every publish prune all but the newest
    // generation, so a reader's list-then-read window races deletion
    // constantly — payloadOf must treat a vanished generation as a
    // stale read and re-list, never surface NoSuchFileException
    // (ADVICE r10).
    val dir = Files.createTempDirectory("graft-ptr-prune-race")
    val p = new CasFilePointer(dir, keepGens = 1)
    p.write("v0")
    import java.util.concurrent.{Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    @volatile var stop = false
    val writer = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = (1 to 2000).foreach(i => p.write(s"v$i"))
    })
    val reader = pool.submit(new java.util.concurrent.Callable[Int] {
      def call(): Int = {
        var n = 0
        while (!stop) { assert(p.read().isDefined); n += 1 }
        n
      }
    })
    writer.get()
    stop = true
    assert(reader.get() > 0, "reader must have made progress")
    pool.shutdown()
    assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    assert(p.read().contains("v2000"))
    // CAS from a pruned observation reports stale (false), not an error
    assert(!p.compareAndSwap(Some("v0"), "late"))
    assert(p.compareAndSwap(Some("v2000"), "final") && p.read().contains("final"))
  }
}
