package graft

/** Deterministic port of the reference's canonical test document
  * (/root/reference/test/unit/lib/testDoc.test.ts:7-75) — fixed ids/dates
  * instead of uuid.v1()/Date.now (FIXTURES.md §1). */
object Fixtures {
  val doc1: String =
    """{
      |  "_id": "doc-0001",
      |  "_rev": "0.rev-0001",
      |  "aBoolean": true,
      |  "aDate": "2020-06-23T12:00:00.000Z",
      |  "aNumber": 31.61705701614879,
      |  "aString": "Thirty One Point Six One Seven ...",
      |  "anObjectWithNoId": {
      |    "aBoolean": false,
      |    "aDate": "2020-06-23T12:00:01.000Z",
      |    "aNumber": 2.0,
      |    "aString": "Two Point Zero"
      |  },
      |  "anObjectWithAnId": {
      |    "id": "obj-01",
      |    "aBoolean": true,
      |    "aDate": "2020-06-23T12:00:02.000Z",
      |    "aNumber": 3.0,
      |    "aString": "Three Point Zero",
      |    "anObjectWithinAnObject": {
      |      "id": "obj-02",
      |      "aBoolean": false,
      |      "aDate": "2020-06-23T12:00:03.000Z",
      |      "aNumber": 6.0,
      |      "aString": "Six Point Zero"
      |    }
      |  },
      |  "anArrayWithNoIds": [
      |    { "aBoolean": true, "aDate": "2020-06-23T12:00:04.000Z", "aNumber": 4.0, "aString": "Four Point Zero" },
      |    { "aBoolean": false, "aDate": "2020-06-23T12:00:05.000Z", "aNumber": 4.2, "aString": "Four Point One" }
      |  ],
      |  "anArrayWithIds": [
      |    { "id": "arr-01", "aBoolean": true, "aDate": "2020-06-23T12:00:06.000Z", "aNumber": 5.0, "aString": "Five Point Zero" },
      |    { "id": "arr-02", "aBoolean": false, "aDate": "2020-06-23T12:00:07.000Z", "aNumber": 5.1, "aString": "Five Point One",
      |      "anObjectWithinAnObjectInAnArray": {
      |        "id": "arr-02-obj", "aBoolean": true, "aDate": "2020-06-23T12:00:08.000Z", "aNumber": 7.0, "aString": "Seven Point Zero"
      |      }
      |    }
      |  ]
      |}""".stripMargin

  /** Schema-evolution delta (sqlDML.test.ts:729-741, FIXTURES.md §2):
    * new id, aString grows past 80 chars (VARCHAR(80)→VARCHAR(800) widen),
    * new root field aNewDate, new nested object with an id under
    * anObjectWithNoId → a brand-new table. */
  val longString: String = "Eight Hundred " * 7 // 98 chars > 80
  val doc2: String =
    s"""{
       |  "_id": "doc-0002",
       |  "_rev": "0.rev-0002",
       |  "aBoolean": false,
       |  "aDate": "2020-06-24T12:00:00.000Z",
       |  "aNewDate": "2020-06-24T13:00:00.000Z",
       |  "aNumber": 11.5,
       |  "aString": "${longString.trim}",
       |  "anObjectWithNoId": {
       |    "aBoolean": true,
       |    "aDate": "2020-06-24T12:00:01.000Z",
       |    "aNumber": 12.0,
       |    "aString": "Twelve Point Zero",
       |    "aNewObject": {
       |      "id": "new-obj-01",
       |      "aBoolean": true,
       |      "aDate": "2020-06-24T12:00:02.000Z",
       |      "aNumber": 13.0,
       |      "aString": "Thirteen Point Zero"
       |    }
       |  },
       |  "anArrayWithIds": [
       |    { "id": "arr-03", "aBoolean": true, "aDate": "2020-06-24T12:00:06.000Z", "aNumber": 15.0, "aString": "Fifteen Point Zero" }
       |  ]
       |}""".stripMargin
}
