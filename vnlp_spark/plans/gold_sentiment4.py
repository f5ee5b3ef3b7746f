"""Fourth frozen sentiment gold split — blind protocol (round 5).

60 FRESH Turkish review-register sentences, hand-labelled and committed
BEFORE the first scoring run — measuring whether the round-5 BULK
lexicon growth (one curated open-vocabulary sweep over the positive and
negative stem lists, done from language knowledge rather than from any
test sentence) moved the honest first-run asymptote off 0.700
(first-run trajectory so far: 0.517 → 0.700 → 0.700; VERDICT r04 asked
for ≥0.85 on a fourth frozen split).

Fresh domains vs splits 1-3: car rental, gym, plumber, optician,
dentist, tailor, bicycle shop, campsite, moving company, language
course, cinema, carpet cleaning, locksmith, florist, computer service —
with vocabulary the earlier splits never used.  The sentences were
written in natural register; the lexicon files were not consulted while
writing them.

Same category mix, per class: 15 plain, 8 negation, 5
mixed-contrastive, 2 terse.  Mixed-register rule unchanged: the label
follows the clause after the contrastive conjunction.

Label semantics: 1 = positive, 0 = negative (reference
SentimentAnalyzer.predict at 0.5,
/root/reference/vnlp/sentiment_analyzer/sentiment_analyzer.py:26-76).
"""
from __future__ import annotations

# (text, label) — ordered: pos-plain 15, pos-negation 8, pos-mixed 5,
# pos-terse 2, then the same for negative.
GOLD_SENTIMENT4: list[tuple[str, int]] = [
    # ---- positive, plain (15) ----
    ("Kiraladığımız araba tertemizdi, teslim işlemi şipşak bitti.", 1),
    ("Spor salonunun aletleri yepyeni, eğitmenler gerçekten ilgili.", 1),
    ("Tesisatçı kaçağı dakikalar içinde buldu, işçiliği çok sağlam.", 1),
    ("Gözlükçü çerçeveyi yüzüme birebir ayarladı, camlar pırıl pırıl.", 1),
    ("Diş hekiminin eli çok hafifmiş, dolgu ağrısız tamamlandı.", 1),
    ("Terzi ceketi tam bedenime oturttu, dikişleri kusursuz.", 1),
    ("Bisikletin vites ayarı şimdi ipek gibi, ustaya helal olsun.", 1),
    ("Kamp alanı huzur dolu, sabah manzarası göz kamaştırıyor.", 1),
    ("Nakliyeciler eşyaları özenle paketledi, tek parça bile çizilmedi.", 1),
    ("Kurstaki hocanın anlatımı çok akıcı, üç ayda kendimi geliştirdim.", 1),
    ("Sinemanın koltukları konforlu, ses sistemi etkileyiciydi.", 1),
    ("Halılar mis gibi kokarak geldi, renkleri adeta canlandı.", 1),
    ("Çilingir beş dakikada kapıyı açtı, üstelik çok makul bir ücret aldı.", 1),
    ("Çiçekçinin hazırladığı buket zevkle seçilmişti, annem bayıldı.", 1),
    ("Bilgisayarım artık ışık hızında açılıyor, servis harika iş çıkardı.", 1),
    # ---- positive, negation (8) ----
    ("Araç teslimatında hiç gecikme yaşamadık, depo da eksik değildi.", 1),
    ("Salonda sıra beklemiyorsunuz, aletler de arızalanmıyor.", 1),
    ("Tesisat bir daha damlatmadı, fatura da kabarık değildi.", 1),
    ("Gözlük burnumu hiç acıtmıyor, saplar da gevşemedi.", 1),
    ("Dolgudan sonra dişim hiç sızlamadı, hassasiyet de kalmadı.", 1),
    ("Pantolonun boyu kısalmadı, kumaşı da buruşmuyor.", 1),
    ("Çadırın fermuarı takılmıyor, direkleri de eğrilmedi.", 1),
    ("Taşınmada hiçbir eşyam kırılmadı, montaj da aksamadı.", 1),
    # ---- positive, mixed-contrastive (5) ----
    ("Ofis biraz kalabalıktı ama danışman her soruma sabırla yanıt verdi.", 1),
    ("Fiyat ilk bakışta yüksek gelebilir fakat malzeme kalitesi her kuruşa değiyor.", 1),
    ("Yol uzundu ancak kamp yerinin güzelliği yorgunluğu unutturdu.", 1),
    ("Randevu bulmak zor olsa da hekimin özeni her şeye bedel.", 1),
    ("Eski ekran kartım sorun çıkarmıştı, oysa yenisi kusursuz çalışıyor.", 1),
    # ---- positive, terse (2) ----
    ("On numara hizmet, gönül rahatlığıyla tavsiye ederim.", 1),
    ("Fiyatıyla performansıyla tam bir kurtarıcı.", 1),
    # ---- negative, plain (15) ----
    ("Kiraladığımız arabanın içi leş gibiydi, koltuklar lekeliydi.", 0),
    ("Salonun soyunma odaları pis, duşlardan sıcak su akmıyor.", 0),
    ("Tesisatçı işi üstünkörü yaptı, boru bir hafta sonra yine patladı.", 0),
    ("Çerçeve iki günde gevşedi, camlar çizik dolu geldi.", 0),
    ("Dolgu yamuk yapılmış, dişim hâlâ zonkluyor.", 0),
    ("Terzi kumaşı yanlış kesmiş, ceket resmen paçavraya döndü.", 0),
    ("Bisikletten gıcırtı hiç eksik olmuyor, fren ayarı da tutmuyor.", 0),
    ("Kamp alanı bakımsız ve izbe, tuvaletler tam bir felaketti.", 0),
    ("Nakliyeciler dolabın aynasını kırdı, üstelik suçu bize attılar.", 0),
    ("Kurs tam bir fiyasko, hoca derslere sürekli geç geldi.", 0),
    ("Sinemanın sesi cızırtılıydı, koltuklar döküntü haldeydi.", 0),
    ("Halılar küf kokarak geldi, saçakları sökülmüştü.", 0),
    ("Çilingir kapıyı çizdi, kilidi de hasarlı taktı.", 0),
    ("Buketteki çiçekler solmuştu, yapraklar kararmıştı.", 0),
    ("Format sonrası bilgisayar daha da yavaşladı, para israfı oldu.", 0),
    # ---- negative, negation (8) ----
    ("Araç vaktinde hazır değildi, depozito da iade edilmedi.", 0),
    ("Eğitmen programa hiç gelmiyor, aletlerin bakımı yapılmıyor.", 0),
    ("Usta randevuya gelmedi, telefonlara da çıkmıyor.", 0),
    ("Gözlük bir haftadır hazır değil, arayan soran da yok.", 0),
    ("Ağrım bir türlü dinmiyor, hekim de çözüm sunmuyor.", 0),
    ("Pantolonun paçası düzgün dikilmemiş, terzi hatasını kabul etmiyor.", 0),
    ("Çadır su geçirmez denmişti, oysa hiç de öyle değilmiş.", 0),
    ("Müşteri hattına bir türlü ulaşamadım, kimse sorumluluk almıyor.", 0),
    # ---- negative, mixed-contrastive (5) ----
    ("Araba yeni görünüyordu ama motor yolda bizi perişan etti.", 0),
    ("Salonun konumu merkezi fakat kalabalıktan aletlere sıra gelmiyor.", 0),
    ("Usta güler yüzlüydü ancak yaptığı iş iki gün bile dayanmadı.", 0),
    ("Fiyat uygun görünse de gizli ücretlerle resmen kazık yedik.", 0),
    ("Paketleme özenliydi, gelgelelim eşyaların yarısı eksik çıktı.", 0),
    # ---- negative, terse (2) ----
    ("Tam bir hayal kırıklığı, boşuna zaman kaybı.", 0),
    ("Berbat işçilik, üstelik fahiş fiyat.", 0),
]

CATS4 = [
    ("pos-plain", 0, 15), ("pos-negation", 15, 23), ("pos-mixed", 23, 28),
    ("pos-terse", 28, 30), ("neg-plain", 30, 45), ("neg-negation", 45, 53),
    ("neg-mixed", 53, 58), ("neg-terse", 58, 60),
]
