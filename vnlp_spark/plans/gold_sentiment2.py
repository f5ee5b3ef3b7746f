"""Second frozen sentiment gold split — blind protocol (round 4).

60 FRESH Turkish review-register sentences, hand-labelled and committed
BEFORE the first scoring run, to measure the first-run generalization of
the clause-scoped scorer built after the first split's 0.517 first run
(BENCH.md).  Deliberately fresh domains vs split 1: gym, hairdresser,
dentist, bakery, bank queue, taxi, plumber, cinema, camping, call
center, rental flat — with vocabulary the first split never used.

Same category mix proportions as split 1, per class: 15 plain, 8
negation, 5 mixed-contrastive, 2 terse.  Mixed-register rule unchanged:
the label follows the clause after the contrastive conjunction.

Label semantics: 1 = positive, 0 = negative (reference
SentimentAnalyzer.predict at 0.5,
/root/reference/vnlp/sentiment_analyzer/sentiment_analyzer.py:26-76).
"""
from __future__ import annotations

# (text, label) — ordered: pos-plain 15, pos-negation 8, pos-mixed 5,
# pos-terse 2, then the same for negative.
GOLD_SENTIMENT2: list[tuple[str, int]] = [
    # ---- positive, plain (15) ----
    ("Spor salonundaki aletler yepyeni, ortam da gayet ferahtı.", 1),
    ("Kuaför tam istediğim modeli yaptı, ellerine sağlık.", 1),
    ("Uygulama çok pratik, iki dakikada işlemi hallettim.", 1),
    ("Dişçi çok nazikti, kendimi emin ellerde hissettim.", 1),
    ("Pide tam kıvamında pişmiş, servis de çok hızlıydı.", 1),
    ("Kargo görevlisi güler yüzlüydü, paket sapasağlam ulaştı.", 1),
    ("Sahil yürüyüş yolu bakımlı ve tertemizdi.", 1),
    ("Tiyatro oyunu müthişti, dakikalarca ayakta alkışladık.", 1),
    ("Bu fırının ekmeği hep taze, çalışanları da çok ilgili.", 1),
    ("Araç tertemiz teslim edildi, deposu da doluydu.", 1),
    ("Müşteri hizmetleri saniyesinde dönüş yaptı, sorunumu anında çözdüler.", 1),
    ("Masaj tam anlamıyla terapi gibiydi, yenilenmiş hissettim.", 1),
    ("Kampın manzarası nefisti, gece gökyüzü büyüleyiciydi.", 1),
    ("Bu markanın kahvesi taptaze, aroması şahane.", 1),
    ("Öğretmen çok sabırlı, dersler gerçekten verimli geçiyor.", 1),
    # ---- positive, negation (8) ----
    ("Hiçbir gecikme olmadı, tören planlandığı gibi başladı.", 1),
    ("Koltuklar hiç rahatsız etmiyor, uzun yolda bel ağrısı yaşamadık.", 1),
    ("Fiyatlar hiç de pahalı değil, üstelik porsiyonlar kocaman.", 1),
    ("Asansör hiç arıza yapmıyor, bina yönetimi işini biliyor.", 1),
    ("Kumaş ilk yıkamada solmadı, dikişleri de atmadı.", 1),
    ("İnternet hiç kopmadı, hız da sözleşmedeki gibi.", 1),
    ("Hiç beklemeden masaya oturduk, siparişler dakikasında geldi.", 1),
    ("Kokusu rahatsız edici değil, cilt de kurutmuyor.", 1),
    # ---- positive, mixed-contrastive (5) ----
    ("Salon biraz küçüktü ama yemeklerin lezzeti her şeyi unutturdu.", 1),
    ("Kurye geç kaldı fakat ürün beklediğimden kaliteli çıktı.", 1),
    ("Fiyatı yüksek olsa da işçiliği parasını sonuna kadar hak ediyor.", 1),
    ("Başta tereddüt etmiştim, ne var ki sonuç beni fazlasıyla memnun etti.", 1),
    ("Yol uzundu ama otelin konforu yorgunluğumuzu aldı.", 1),
    # ---- positive, terse (2) ----
    ("On numara, beş yıldız.", 1),
    ("Helal olsun, adamlar işini biliyor.", 1),
    # ---- negative, plain (15) ----
    ("Salata bayattı, zeytinyağı da acımıştı.", 0),
    ("Taksici uzun yoldan dolandırdı, üstüne bir de ters konuştu.", 0),
    ("Sinemanın koltukları döküntüydü, ses sistemi patlak çalıyordu.", 0),
    ("Banka sırasında iki saat süründük, tek gişe açıktı.", 0),
    ("Kumanda üç günde bozuldu, piller de akmıştı.", 0),
    ("Havuz suyu bulanıktı, etrafta sinekler uçuşuyordu.", 0),
    ("Montun fermuarı ilk haftada koptu, astarı da söküldü.", 0),
    ("Tesisat ustası ortalığı batırdı, parayı da fazlasıyla aldı.", 0),
    ("Dondurma erimiş halde servis edildi, külah da yumuşamıştı.", 0),
    ("Mağaza izbe gibiydi, raflar darmadağınıktı.", 0),
    ("Eldivenin dikişi elimi kesti, iade için de uğraştırdılar.", 0),
    ("Konserde ses sürekli çatladı, sahne arkası koktu.", 0),
    ("Kiraladığımız ev rutubet içindeydi, duvarlar kabarmıştı.", 0),
    ("Teknik servis telefonu yüzümüze kapattı.", 0),
    ("Menü fahiş fiyatlıydı, tabaklar yarım porsiyondu.", 0),
    # ---- negative, negation (8) ----
    ("Söz verdikleri hiçbir şeyi yapmadılar, arayan soran da olmadı.", 0),
    ("Oda hiç havalandırılmamıştı, sigara kokusu gitmemişti.", 0),
    ("Ürün orijinal değilmiş, kutusu bile tutmuyor.", 0),
    ("Garson siparişi doğru getirmedi, özür de dilemedi.", 0),
    ("Bir daha bu kargoyla çalışmam, paketim üç kez kayboldu.", 0),
    ("Ekran hiç net değil, renkler soluk görünüyor.", 0),
    ("Temsilci derdimi dinlemedi bile, sürekli sözümü kesti.", 0),
    ("Kesinlikle güvenmeyin, söyledikleri hiçbir şey doğru çıkmadı.", 0),
    # ---- negative, mixed-contrastive (5) ----
    ("Dekorasyon hoştu ama tabağımdan kıl çıktı, midem bulandı.", 0),
    ("Personel kibardı fakat rezervasyonumuz kaybolmuş, sokakta kaldık.", 0),
    ("İlk ay sorunsuzdu, ne var ki sonra cihaz kendi kendine kapanmaya başladı.", 0),
    ("Ambalaj şıktı, gel gör ki içindeki ürün ikinci el çıktı.", 0),
    ("Fiyat uygundu ama kumaş bir yıkamada çekti, rengi aktı.", 0),
    # ---- negative, terse (2) ----
    ("Yazıklar olsun, resmen kandırdılar.", 0),
    ("El insaf, bu kadarına pes.", 0),
]
